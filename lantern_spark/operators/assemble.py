"""End-to-end pretraining-corpus assembly — the north-star pipeline
COMPOSED: curation (URL scrub + rewrites + heuristics) → dedup tiers
(exact / LSH near-dup / exact-substring, as curation stages) →
decontamination against a held-out eval set → token-budget mixture →
sequence packing. One call, staged checkpoints, per-stage row/token
accounting.

This is the integration surface the unit operators exist for — a
cross-stage contract test as much as a feature: every stage consumes
the previous stage's exact output schema, and the whole run is
resumable at stage granularity (``curate_corpus_staged``'s atomic
checkpoint/fingerprint machinery for the curation tiers; the cheap
tail stages — decontaminate, budget, pack — recompute from the last
curation checkpoint, which is where the expensive shuffles live).

Scale shape (100 TB): identical to the parts — the pipeline adds NO
new shuffles beyond its stages' own (documented per operator); stage
accounting reads checkpoint row counts (cheap at bench scale; at
corpus scale use ``curation_audit``'s one-scan reason accounting for
the heuristic block instead — the report includes it).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lantern_spark.operators.curate import (
    CurationConfig,
    _curation_stages,
    curate_corpus_staged,
    decontaminate,
)
from lantern_spark.operators.pack import pack_sequences, sample_to_token_budget
from lantern_spark.operators.textstats import token_count_ws


@dataclass
class AssemblyResult:
    """The packed corpus plus the per-stage accounting a multi-day run
    reports: ``stage_rows`` in pipeline order (input → each curation
    stage → decontaminated → budgeted), token totals in/out, pack
    stats, and (when :func:`plan_assembly` drove the tier choice) the
    plan decision."""

    df: DataFrame
    stage_rows: Dict[str, int] = field(default_factory=dict)
    tokens_in: int = 0
    tokens_out: int = 0
    n_packs: int = 0
    plan: Optional["AssemblyPlan"] = None


@dataclass(frozen=True)
class StageProfile:
    """One dedup tier's measured economics, read off a prior run's
    per-stage drop table (the bench assembly row publishes exactly
    this): ``drop_rate`` = fraction of input tokens the tier removes,
    ``cost_per_mtok`` = seconds per million input tokens."""

    name: str
    drop_rate: float
    cost_per_mtok: float


@dataclass
class AssemblyPlan:
    """A tier selection plus its predicted economics and the reason —
    :func:`plan_assembly`'s output, recorded in
    :class:`AssemblyResult` so the choice is auditable."""

    run: List[str]
    skip: List[str]
    predicted_tokens_out: int
    predicted_cost_s: float
    feasible: bool
    decision: str

    def apply_to(self, cfg):
        """A copy of ``cfg`` with the SKIPPED tiers disabled (plan
        names map to CurationConfig knobs: ``url_dedup``,
        ``exact_dedup``, ``near_dedup``, ``substr_dedup``). Tiers the
        plan runs must already be enabled in ``cfg`` — planning
        selects among configured tiers, it cannot invent the knobs
        (min-token spans, thresholds) a tier needs."""
        updates = {}
        knobs = {
            "url_dedup": ("url_dedup", False),
            "exact_dedup": ("exact_dedup", False),
            "near_dedup": ("near_dedup", False),
            "substr_dedup": ("substr_dedup_min_tokens", None),
        }
        for tier in self.skip:
            if tier in knobs:
                field_name, off = knobs[tier]
                updates[field_name] = off
        for tier in self.run:
            if tier not in knobs:
                continue
            field_name, off = knobs[tier]
            if getattr(cfg, field_name) == off:
                raise ValueError(
                    f"plan runs tier {tier!r} but the config has "
                    f"{field_name}={off!r} — enable it (with its "
                    "knobs) before planning"
                )
            # url_dedup's stage gate is url_col AND url_dedup
            # (curate._curation_stages) — a plan that 'runs' the tier
            # with url_col unset would silently never execute it and
            # the corpus would overshoot predicted_tokens_out.
            if tier == "url_dedup" and getattr(cfg, "url_col", None) is None:
                raise ValueError(
                    "plan runs tier 'url_dedup' but the config has "
                    "url_col=None — the stage would silently not run; "
                    "set url_col before planning"
                )
        return dataclasses.replace(cfg, **updates)


def plan_assembly(
    tokens_in: int,
    target_tokens: int,
    profiles: Sequence[StageProfile],
    required: Sequence[str] = (),
) -> AssemblyPlan:
    """Choose which dedup tiers to run so the corpus lands at
    ``target_tokens`` at minimum cost — the reference autotune's
    selection rule (index_autotune/mod.rs:161-186: min latency among
    variants meeting the recall target, else max recall) applied to
    the assembly pipeline's measured per-tier drop/cost profiles.

    Model: tiers apply in ``profiles`` order (the pipeline order —
    URL → exact → LSH → substring); a chosen tier removes
    ``drop_rate`` of the tokens REACHING it and costs
    ``cost_per_mtok`` per million of those tokens, so skipping an
    early tier makes every later tier both more expensive and
    higher-volume — which is why this is a search over subsets
    (2^n, n = a handful) rather than a per-tier threshold.

    A variant is FEASIBLE when dedup alone brings predicted tokens to
    ≤ ``target_tokens`` — then the mixture sampler never has to
    discard unique documents to hit the budget. Among feasible
    variants the cheapest wins; if none is feasible the plan keeps
    the variant with the fewest predicted tokens (max total drop,
    cheapest on ties) and reports ``feasible=False`` — the honest
    "every configured tier still overshoots" answer. ``required``
    tiers are always run (e.g. decontamination-adjacent policies)."""
    req = set(required)
    names = [p.name for p in profiles]
    unknown = req - set(names)
    if unknown:
        raise ValueError(f"required tiers not in profiles: {sorted(unknown)}")
    best: Optional[Tuple[bool, float, int, List[str]]] = None
    n = len(profiles)
    for mask in range(1 << n):
        chosen = [profiles[i] for i in range(n) if mask >> i & 1]
        chosen_names = [p.name for p in chosen]
        if not req.issubset(chosen_names):
            continue
        toks = float(tokens_in)
        cost = 0.0
        for p in chosen:
            cost += toks / 1e6 * p.cost_per_mtok
            toks *= 1.0 - p.drop_rate
        feasible = toks <= target_tokens
        key = (feasible, cost, int(toks), chosen_names)
        if best is None:
            best = key
            continue
        b_feas, b_cost, b_toks, _ = best
        if feasible and not b_feas:
            best = key
        elif feasible == b_feas:
            if feasible:
                if cost < b_cost:
                    best = key
            else:
                if (int(toks), cost) < (b_toks, b_cost):
                    best = key
    feasible, cost, toks, chosen_names = best
    skip = [p.name for p in profiles if p.name not in chosen_names]
    if feasible:
        decision = (
            f"run {chosen_names or ['<none>']}: cheapest variant "
            f"predicted to reach {toks} <= budget {target_tokens} "
            f"tokens at {cost:.2f}s"
        )
    else:
        decision = (
            f"no variant reaches budget {target_tokens}; running "
            f"{chosen_names} for max drop ({toks} tokens predicted, "
            f"{cost:.2f}s) — the mixture sampler covers the rest"
        )
    return AssemblyPlan(
        run=chosen_names,
        skip=skip,
        predicted_tokens_out=toks,
        predicted_cost_s=round(cost, 3),
        feasible=feasible,
        decision=decision,
    )


def assemble_pretraining_corpus(
    spark,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    curation: Optional[CurationConfig] = None,
    heldout: Optional[DataFrame] = None,
    decontaminate_ngram: int = 13,
    decontaminate_fuzzy_threshold: Optional[float] = None,
    source_col: Optional[str] = None,
    token_budgets: Optional[Dict[str, float]] = None,
    seq_tokens: int = 1024,
    report: bool = True,
    token_count=None,
    plan: Optional[AssemblyPlan] = None,
    export_tokenizer=None,
    export_eos_id: Optional[int] = None,
    export_pad_id: Optional[int] = None,
    export_specials: Sequence[str] = (),
) -> AssemblyResult:
    """Run the full assembly; returns :class:`AssemblyResult`.

    - ``curation``: any :class:`CurationConfig` — its stage list (URL
      scrub, rewrites, heuristics, exact/near/substring dedup) runs
      through :func:`curate_corpus_staged`, so a re-run resumes from
      the first stage whose config changed;
    - ``heldout``: eval corpus for GPT-3-style 13-gram
      decontamination (skipped when None);
      ``decontaminate_fuzzy_threshold`` (r10) additionally runs the
      MinHash/LSH + Jaccard-verified fuzzy tier
      (:func:`~lantern_spark.operators.curate.decontaminate_fuzzy`)
      after the exact rule — paraphrased eval leakage has no verbatim
      13-gram but is still substantially the eval item;
    - ``token_budgets``: per-``source_col`` token budgets for the
      mixture step (skipped when None) — expectation-exact map-only
      rates, the 100 TB mode of :func:`sample_to_token_budget`;
    - ``seq_tokens``: training-sequence budget for
      :func:`pack_sequences` (GPT concat-then-chunk start-offset
      binning);
    - ``token_count`` (r10, review r9 item 4): one Column expression
      used for EVERY token accounting in the run — the tokens_in/out
      report, the mixture budgets, and the packing bins (e.g.
      ``BPETokenizer(...).token_count_expr(text_col)`` so budgets are
      in the unit the trainer tokenizes). Default stays the
      whitespace counter. One counter everywhere by construction —
      budgets, bins, and stats can never disagree on units.

    ``plan`` (r10, review r9 item 8): a :func:`plan_assembly` tier
    selection — its skipped dedup tiers are disabled on a COPY of the
    curation config and the decision is recorded on the result
    (``res.plan``), so the report shows WHY a tier didn't run.

    ``export_tokenizer`` (r10): a
    :class:`~lantern_spark.operators.bpe.BPETokenizer` switches the
    final stage from text packing to
    :func:`~lantern_spark.operators.pack.export_packed_ids` — the
    result DataFrame is then trainer-ready ``(pack_id, input_ids,
    n_tokens, n_docs, doc_starts)`` shards and ``tokens_out`` counts
    real ids; ``export_eos_id``/``export_pad_id``/``export_specials``
    pass through.

    ``report=True`` counts rows at each stage boundary (one cheap job
    per boundary at bench scale — turn off for production and read
    the curation checkpoints / ``curation_audit`` instead)."""
    cfg = curation or CurationConfig()
    if plan is not None:
        cfg = plan.apply_to(cfg)
    res = AssemblyResult(df=docs, plan=plan)
    # one-counter contract: with an export tokenizer and no explicit
    # counter, the accounting/budget counter defaults to THAT
    # tokenizer's count — otherwise mixture budgets would be set in
    # whitespace tokens while the shards are delivered in BPE ids
    # (~1.3-2× apart; review finding)
    if token_count is not None:
        tok = token_count
    elif export_tokenizer is not None:
        tok = export_tokenizer.token_count_expr(text_col)
    else:
        tok = token_count_ws(text_col)

    def note(name: str, frame: DataFrame) -> DataFrame:
        if report:
            res.stage_rows[name] = frame.count()
        return frame

    note("input", docs)
    if report:
        res.tokens_in = int(
            docs.agg(F.sum(tok).alias("t")).first()["t"] or 0
        )

    out = curate_corpus_staged(
        spark, docs, text_col, id_col, checkpoint_dir, cfg
    )
    if report:
        # per-stage counts straight from the checkpoints — no
        # recompute (each read is one parquet count over the stage's
        # own output)
        import os

        for i, (name, _fn) in enumerate(
            _curation_stages(text_col, id_col, cfg)
        ):
            stage_dir = os.path.join(checkpoint_dir, f"{i:02d}_{name}")
            res.stage_rows[name] = spark.read.parquet(stage_dir).count()

    if heldout is not None:
        out = note(
            "decontaminated",
            decontaminate(
                out, heldout, text_col, id_col, ngram=decontaminate_ngram
            ),
        )
        if decontaminate_fuzzy_threshold is not None:
            from lantern_spark.operators.curate import decontaminate_fuzzy

            out = note(
                "decontaminated_fuzzy",
                decontaminate_fuzzy(
                    out, heldout, text_col, id_col,
                    threshold=float(decontaminate_fuzzy_threshold),
                ),
            )

    if token_budgets:
        if not source_col:
            raise ValueError("token_budgets requires source_col")
        out = note(
            "budgeted",
            sample_to_token_budget(
                out, source_col, id_col, token_budgets, tok
            ),
        )

    if export_tokenizer is not None:
        # trainer-ready shards: the final stage swaps text packing for
        # token-id packing (same binning contract; one extra Arrow
        # pass for encoding, which a trainer pays anyway)
        from lantern_spark.operators.pack import export_packed_ids

        shards = export_packed_ids(
            out, text_col, id_col, export_tokenizer,
            seq_len=int(seq_tokens), eos_id=export_eos_id,
            pad_id=export_pad_id, specials=export_specials,
        )
        res.df = shards
        if report:
            agg = shards.agg(
                F.sum("n_tokens").alias("t"), F.count("*").alias("p")
            ).first()
            res.tokens_out = int(agg["t"] or 0)
            res.n_packs = int(agg["p"] or 0)
        return res

    out = pack_sequences(
        out, text_col, id_col, max_tokens=int(seq_tokens), token_count=tok
    )
    res.df = out
    if report:
        agg = out.agg(
            F.sum(tok).alias("t"),
            F.countDistinct("pack_id").alias("p"),
        ).first()
        res.tokens_out = int(agg["t"] or 0)
        res.n_packs = int(agg["p"] or 0)
    return res
