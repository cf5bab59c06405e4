"""Training-set assembly: deterministic splits, mixture sampling,
sequence packing.

North-star extensions (BASELINE.json): after curation
(operators/curate) a pretraining pipeline still needs to (a) carve
reproducible train/val/test splits, (b) mix sources at prescribed
weights, and (c) pack variable-length documents into fixed token
budgets for the trainer. All three as declarative DataFrame
transforms:

- ``hash_split``: split membership = md5(id) bucket — deterministic
  across runs/engines/cluster sizes (never ``rand()``, which is
  per-task nondeterministic under retries), map-only.
- ``mixture_sample``: per-source Bernoulli keep with md5-derived
  uniforms — deterministic sampling at source-level rates, map-only
  after a broadcast join of the (tiny) weights table.
- ``pack_sequences``: greedy first-fit-by-order packing of documents
  into ``max_tokens`` bins WITHIN each partition-local chunk — the
  global-order greedy pack is inherently sequential, so the contract
  is per-chunk packing (chunk = salt bucket), which is what
  distributed trainers do anyway (pack within shard). One window pass
  computes running token sums; bin id = floor(cumsum / max_tokens)
  ordered by id — deterministic, no UDFs.

Scale notes (100 TB): hash_split and mixture_sample are pure column
expressions on top of the scan; pack_sequences shuffles once on the
chunk key and runs one window per chunk — the same shape as the salted
top-k operator (operators/topk).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lantern_spark.operators.textstats import token_count_ws


def _unit_uniform(col) -> "F.Column":
    """Deterministic uniform in [0, 1) from md5(value) — engine-portable
    (same construction as the MinHash 48-bit halves)."""
    c = col if not isinstance(col, str) else F.col(col)
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(float(2**48))
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: Dict[str, float],
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign every row to a named split with the given fractions,
    deterministically by id hash. ``salt`` derives independent splits
    from the same ids (e.g. per-epoch validation rotation)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1 (got {total})")
    u = _unit_uniform(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1])
        if expr is None
        else expr.otherwise(names[-1])
    )
    return df.withColumn(out_col, expr)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    rates: Dict[str, float],
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with its source's sampling rate (0 ≤ rate ≤ 1),
    deterministically — the data-mixture step of a pretraining recipe
    (e.g. upweight wiki by keeping 100%, downsample crawl to 30%).
    Rates ride in as a broadcast-joined tiny table so the filter stays
    a single map-only pass over the corpus."""
    spark = df.sparkSession
    rate_rows = [(k, float(v)) for k, v in rates.items()]
    from lantern_spark.types import local_df

    rates_df = local_df(
        spark, rate_rows, f"{source_col} string, __rate double"
    )
    u = _unit_uniform(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    return (
        df.join(F.broadcast(rates_df), source_col, "left")
        .withColumn("__rate", F.coalesce("__rate", F.lit(float(default_rate))))
        .filter(u < F.col("__rate"))
        .drop("__rate")
    )


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_tokens: int,
    chunks: int = 256,
    out_col: str = "pack_id",
    token_count=None,
    id_range=None,
) -> DataFrame:
    """Assign each document a pack id by its START OFFSET in the
    id-ordered virtual token stream of its chunk — GPT-style
    concat-then-chunk packing: a document lands in the bin where it
    begins, so a bin's token total can exceed ``max_tokens`` by less
    than one document (the trainer truncates or spills the straddling
    tail). Token counts are clamped to the budget, so an over-long
    document consumes exactly one bin width.

    Pack id = (chunk, floor((cumsum − tokens) / max_tokens)) over the
    id-ordered running token sum — a single window per chunk, no UDFs.
    (Exact ≤-budget first-fit is a sequential recurrence — bin
    boundaries depend on all previous ones — and optimal packing is
    NP-hard and order-destroying; start-offset binning is the
    deterministic, shuffle-once contract trainers actually use.)

    ``token_count``: optional Column of per-document token counts —
    pass a real tokenizer's count (e.g. ``BPETokenizer.
    token_count_expr``) instead of the whitespace default, so packing
    budgets match what the trainer will actually see.

    Parallelism (r15, guide §2): when ``chunks`` is below the
    session's parallelism and the id is integral, the running sum is
    computed as a TWO-LEVEL prefix sum — id-range shards within each
    chunk get local window sums, and the per-(chunk, shard) totals
    (a ≤2·parallelism-row aggregate) turn into broadcast exclusive
    offsets with a window over that TINY relation, so the global sum
    is ``local + offset``. Bit-identical bins (integer token sums are
    exact; the final floor-division is the same op), and no
    single-partition window ever sees the data — the ``chunks=1``
    shape previously serialized the whole corpus (rows AND payload
    columns) through one task (bench scaling ratio 0.78). Costs one
    bounded min/max/count action at plan-construction time to derive
    the shard ranges — or none when the caller passes ``id_range=
    (lo, hi)``, a guarantee that every id is non-NULL and inside
    [lo, hi] (callers that can read the range off a cheaper,
    pre-filter relation should: any superset range only shifts shard
    balance, never bin values).
    """
    toks = F.least(
        token_count if token_count is not None else token_count_ws(text_col),
        F.lit(max_tokens),
    )
    chunk = F.abs(F.xxhash64(F.col(id_col))) % chunks
    from pyspark.sql import types as T

    dp = df.sparkSession.sparkContext.defaultParallelism
    integral_id = isinstance(
        df.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    )
    if integral_id and int(chunks) < max(2, dp):
        sharded = _pack_sequences_sharded(
            df, id_col, max_tokens, chunk, toks, out_col, id_range
        )
        if sharded is not None:
            return sharded
    w = (
        Window.partitionBy("__chunk")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        df.withColumn("__chunk", chunk)
        .withColumn("__toks", toks)
        .withColumn("__cum", F.sum("__toks").over(w))
        .withColumn(
            "__bin",
            F.floor((F.col("__cum") - F.col("__toks")) / max_tokens),
        )
        .withColumn(
            out_col,
            F.concat_ws(
                ":", F.col("__chunk").cast("string"), F.col("__bin").cast("string")
            ),
        )
        .drop("__chunk", "__toks", "__cum", "__bin")
    )
    return out


def _pack_sequences_sharded(
    df: DataFrame,
    id_col: str,
    max_tokens: int,
    chunk,
    toks,
    out_col: str,
    id_range=None,
) -> Optional[DataFrame]:
    """Two-level prefix-sum form of :func:`pack_sequences` (see its
    docstring). Shards are CONTIGUOUS id ranges, so within a chunk
    ``global_cum(row) = local_cum(row) + Σ totals(earlier shards)``
    exactly — all sums are integer-exact longs and the bin expression
    is unchanged. Entirely lazy except one bounded min/max/count
    action deriving the shard ranges: the exclusive offsets come from
    a window over the ≤(chunks·nshards)-row totals AGGREGATE (a tiny
    broadcast side), not a driver collect, and rows keep their
    identity — no re-attach join on the id, so duplicate ids behave
    exactly as the plain window form. Returns None when the input is
    empty or carries NULL ids (the (chunk, shard) join keys would go
    NULL and drop those rows — the plain window keeps them).
    """
    spark = df.sparkSession
    dp = spark.sparkContext.defaultParallelism
    if id_range is not None:
        lo, hi = int(id_range[0]), int(id_range[1])
        if hi < lo:
            return None
    else:
        mm = df.agg(
            F.min(id_col).alias("lo"),
            F.max(id_col).alias("hi"),
            F.count(F.lit(1)).alias("nall"),
            F.count(id_col).alias("nid"),
        ).first()
        if mm["lo"] is None or int(mm["nall"]) != int(mm["nid"]):
            return None
        lo, hi = int(mm["lo"]), int(mm["hi"])
    nshards = max(2, 2 * dp)
    width = max(1, -(-(hi - lo + 1) // nshards))  # ceil
    base = (
        df.withColumn("__chunk", chunk)
        .withColumn("__toks", toks)
        # integer `div`: double division would lose exactness for
        # wide ids
        .withColumn(
            "__shard", F.expr(f"(`{id_col}` - {lo}) div {width}")
        )
    )
    w_local = (
        Window.partitionBy("__chunk", "__shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # exclusive per-shard offsets: a running sum over the per-shard
    # totals — single-partition per chunk, but over at most nshards
    # AGGREGATE rows (≈2·parallelism), never the data
    w_off = (
        Window.partitionBy("__chunk")
        .orderBy(F.col("__shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = F.broadcast(
        base.groupBy("__chunk", "__shard")
        .agg(F.sum("__toks").alias("__t"))
        .select(
            "__chunk",
            "__shard",
            F.coalesce(F.sum("__t").over(w_off), F.lit(0))
            .cast("long")
            .alias("__off"),
        )
    )
    return (
        base.withColumn("__lcum", F.sum("__toks").over(w_local))
        .join(offs, ["__chunk", "__shard"])
        .withColumn(
            out_col,
            F.concat_ws(
                ":",
                F.col("__chunk").cast("string"),
                F.floor(
                    (F.col("__lcum") + F.col("__off") - F.col("__toks"))
                    / max_tokens
                ).cast("string"),
            ),
        )
        .drop("__chunk", "__toks", "__shard", "__lcum", "__off")
    )


def pack_stats(
    packed: DataFrame,
    text_col: str,
    pack_col: str = "pack_id",
    token_count=None,
) -> DataFrame:
    """(pack_id, n_docs, total_tokens) — the fill-rate probe.

    ``token_count`` (r10, review r9 nit 1): pass the SAME counter the
    bins were packed with (e.g. ``BPETokenizer.token_count_expr``) so
    the fill rates report in the unit the budget was set in; the
    default remains the whitespace counter, matching
    :func:`pack_sequences`'s own default."""
    tc = token_count if token_count is not None else token_count_ws(text_col)
    return packed.groupBy(pack_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
    )


def rates_for_token_budgets(
    df: DataFrame,
    source_col: str,
    budgets: Dict[str, float],
    token_count,
    allow_upsample: bool = False,
    max_rate: float = 8.0,
) -> Dict[str, float]:
    """Per-source keep rates that hit TOKEN budgets in expectation:
    rate_s = budget_s / total_tokens_s, capped at 1 (downsample-only,
    the default) or at ``max_rate`` with ``allow_upsample=True`` —
    rates above 1 mean REPEAT the source (multi-epoch upsampling of a
    small high-quality source, the standard mixture trick; the cap
    guards against a typo'd budget repeating a tiny source hundreds
    of times). One aggregate scan (n_sources rows to the driver)."""
    tc = token_count if not isinstance(token_count, str) else F.col(token_count)
    cap = float(max_rate) if allow_upsample else 1.0
    totals = {
        r[source_col]: r["t"]
        for r in df.groupBy(source_col)
        .agg(F.sum(tc).alias("t"))
        .collect()
    }
    return {
        s: min(cap, float(b) / totals[s])
        for s, b in budgets.items()
        if s in totals and totals[s]
    }


def sample_to_token_budget(
    df: DataFrame,
    source_col: str,
    id_col: str,
    budgets: Dict[str, float],
    token_count,
    exact: bool = False,
    salt: str = "",
    keep_unbudgeted: bool = True,
    allow_upsample: bool = False,
    max_rate: float = 8.0,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministically sample each source down to a TOKEN budget —
    the "mixture by token share" step of a pretraining recipe
    ("1B tokens: 60% web, 20% code, 20% wiki") where
    :func:`mixture_sample` speaks per-row rates.

    ``token_count``: a column name or Column expression giving each
    row's token count (e.g. ``token_count_ws("text")`` or a
    precomputed column).

    Two modes, same md5-priority determinism (retry-safe, no rand()):

    - ``exact=False`` (default, the 100 TB path): convert budgets to
      per-source keep RATES from one aggregate scan
      (:func:`rates_for_token_budgets`) and filter map-only. Budgets
      are hit in EXPECTATION — relative error ~1/sqrt(docs_kept),
      negligible at corpus scale.
    - ``exact=True``: admit docs in priority order while the running
      per-source token total is under budget (overshoot < one doc,
      the `pack_sequences` start-offset convention). Costs a window
      shuffle PARTITIONED BY SOURCE — one task per source, so a
      mega-source becomes a straggler; meant for moderate corpora or
      many-sourced mixtures, and documented as such.

    Sources without a budget are kept whole (``keep_unbudgeted=True``)
    or dropped — both deterministic.

    ``allow_upsample=True`` (map-only mode only): a budget LARGER than
    the source repeats it — rate r = k + f emits k full copies of
    every row plus one more with probability f (deterministic per
    (id, salt, copy)), each tagged in ``epoch_col`` so packing /
    shuffling downstream can distinguish repeats. Expectation-exact
    like downsampling, zero shuffles (an ``explode(sequence(...))``
    per row); capped at ``max_rate`` epochs. Unbudgeted sources get
    epoch 0."""
    tc = token_count if not isinstance(token_count, str) else F.col(token_count)
    spark = df.sparkSession
    budget_rows = [(k, float(v)) for k, v in budgets.items()]
    from lantern_spark.types import local_df

    budgets_df = F.broadcast(
        local_df(
            spark, budget_rows, f"{source_col} string, __budget double"
        )
    )
    u = _unit_uniform(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    joined = df.join(budgets_df, source_col, "left")
    unbudgeted_keep = (
        F.col("__budget").isNull()
        if keep_unbudgeted
        else F.lit(False) & F.col("__budget").isNull()
    )
    if not exact:
        rates = rates_for_token_budgets(
            df, source_col, budgets, tc,
            allow_upsample=allow_upsample, max_rate=max_rate,
        )
        rates_df = F.broadcast(
            local_df(
                spark,
                [(k, v) for k, v in rates.items()] or [(None, 0.0)],
                f"{source_col} string, __rate double",
            )
        )
        joined_r = joined.join(rates_df, source_col, "left")
        if not allow_upsample:
            return joined_r.filter(
                unbudgeted_keep | (u < F.coalesce("__rate", F.lit(0.0)))
            ).drop("__budget", "__rate")
        # Upsampling: k = floor(rate) full copies, plus one more with
        # probability frac(rate). The fractional coin is the SAME `u`
        # as the downsample filter, so for rate < 1 the two modes
        # select the identical subset — allow_upsample=True is a
        # strict superset-consistent extension of the default mode
        # (review finding: a distinct coin silently reshuffled
        # downsampled sources when the flag was toggled).
        rate = F.coalesce("__rate", F.lit(0.0))
        n_copies = F.when(unbudgeted_keep, F.lit(1)).otherwise(
            F.floor(rate).cast("int")
            + F.when(u < (rate - F.floor(rate)), 1).otherwise(0)
        )
        return (
            joined_r.withColumn("__n", n_copies)
            .filter(F.col("__n") > 0)
            .withColumn(
                epoch_col,
                F.explode(F.sequence(F.lit(0), F.col("__n") - 1)),
            )
            .drop("__budget", "__rate", "__n")
        )
    if allow_upsample:
        raise ValueError("allow_upsample requires exact=False (map-only mode)")
    w = (
        Window.partitionBy(source_col)
        .orderBy(u.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tc).over(w), F.lit(0).cast("double"))
    return (
        joined.withColumn("__before", before)
        .filter(unbudgeted_keep | (F.col("__before") < F.col("__budget")))
        .drop("__budget", "__before")
    )


def export_packed_ids(
    df: DataFrame,
    text_col: str,
    id_col: str,
    tokenizer,
    seq_len: int,
    eos_id: Optional[int] = None,
    pad_id: Optional[int] = None,
    chunks: int = 256,
    specials: Sequence[str] = (),
    token_ids=None,
) -> DataFrame:
    """The last mile: packed TRAINING SEQUENCES of token ids — what a
    trainer's data loader actually consumes — from a curated text
    table, in one call.

    Columns out: ``pack_id``, ``input_ids array<int>`` (exactly
    ``seq_len`` when padded, ≤ ``seq_len`` otherwise), ``n_tokens``
    (real ids, excluding pad), ``n_docs``, ``doc_starts array<int>``
    (offset of each document's first id — the boundary table attention
    masking and loss-masking need).

    Mechanics: documents bin via :func:`pack_sequences` with the
    TOKENIZER's own count (+1 per doc when ``eos_id`` is set, so bin
    budgets account for the separator), then one shuffle of id ARRAYS
    per bin — never a row per token — flattens each bin in ``id_col``
    order and truncates at ``seq_len`` (start-offset binning overflows
    by < 1 document; the truncated tail is the same tail the
    pack_sequences contract already documents). ``pad_id`` pads the
    final short sequence; default leaves it short (trainers that pack
    don't pad). ``tokenizer`` is a
    :class:`~lantern_spark.operators.bpe.BPETokenizer`; pass
    ``token_ids=`` (a Column of array<int>) to use any other
    tokenizer's ids with the same packing mechanics.
    """
    from lantern_spark.types import ensure_parallelism

    if token_ids is None:
        token_ids = tokenizer.token_ids_expr(text_col, specials=specials)
    # spread the tokenizer over cores before it runs (r15, guide §2.5
    # — a single-row-group input scans as one partition and the id
    # hashing ran single-task); no-op at real scale. The id-range agg
    # below stays on the PRE-repartition relation: min/max/count are
    # partition-invariant, and running them through the round-robin
    # exchange pays an extra AQE stage per export (measured 3 → 2 jobs)
    src0 = df
    df = ensure_parallelism(df)
    # empty-doc filter runs on the RAW ids, before the eos append —
    # otherwise a zero-token document (non-Latin text through the
    # ascii BPE front end, punctuation-only rows) would export as a
    # phantom lone-eos 'document' (review finding)
    raw = df.select(F.col(id_col), token_ids.alias("__raw")).where(
        F.col("__raw").isNotNull() & (F.size("__raw") > 0)
    )
    ids = (
        F.concat(F.col("__raw"), F.array(F.lit(int(eos_id)).cast("int")))
        if eos_id is not None
        else F.col("__raw")
    )
    tagged = raw.select(F.col(id_col), ids.alias("__ids"))
    # id range off the PRE-tokenize relation (r15): pack_sequences'
    # own min/max action over ``tagged`` would have to tokenize every
    # row just to bound the ids; this scan is column-pruned to the id.
    # The unfiltered range is a superset of the packed rows' range —
    # only shard balance shifts, bins are unchanged — and NULL ids
    # (which the sharded path must not see) are detected here too.
    id_range = None
    rng = src0.agg(
        F.min(id_col).alias("lo"),
        F.max(id_col).alias("hi"),
        F.count(F.lit(1)).alias("nall"),
        F.count(id_col).alias("nid"),
    ).first()
    if rng["lo"] is not None and int(rng["nall"]) == int(rng["nid"]):
        id_range = (int(rng["lo"]), int(rng["hi"]))
    packed = pack_sequences(
        tagged, "__ids", id_col, max_tokens=int(seq_len),
        chunks=chunks, token_count=F.size("__ids"), id_range=id_range,
    )
    agg = (
        packed.groupBy("pack_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("i"), "__ids"))
            ).alias("__docs")
        )
    )
    flat = agg.select(
        "pack_id",
        F.slice(
            F.flatten(F.col("__docs.__ids")), 1, int(seq_len)
        ).alias("input_ids"),
        F.size(F.col("__docs")).alias("n_docs"),
        # running offsets of each doc's first id (0-based), clipped to
        # the kept window — ONE aggregate scan over the per-doc sizes
        # (exclusive prefix sum; re-slicing the nested id arrays per
        # index would be quadratic in ids per pack, review finding)
        F.filter(
            F.aggregate(
                F.transform(F.col("__docs"), lambda d: F.size(d["__ids"])),
                F.struct(
                    F.lit(0).alias("s"),
                    F.expr("array()").cast("array<int>").alias("a"),
                ),
                lambda acc, n: F.struct(
                    (acc["s"] + n).alias("s"),
                    F.concat(acc["a"], F.array(acc["s"])).alias("a"),
                ),
                lambda acc: acc["a"],
            ),
            lambda s: s < int(seq_len),
        ).alias("doc_starts"),
    )
    out = flat.withColumn("n_tokens", F.size("input_ids"))
    if pad_id is not None:
        short = F.col("n_tokens") < int(seq_len)
        pad = F.array_repeat(
            F.lit(int(pad_id)).cast("int"),
            F.lit(int(seq_len)) - F.col("n_tokens"),
        )
        out = out.withColumn(
            "input_ids",
            F.when(short, F.concat("input_ids", pad)).otherwise(
                F.col("input_ids")
            ),
        )
    return out.select(
        "pack_id", "input_ids", "n_tokens", "n_docs", "doc_starts"
    )
