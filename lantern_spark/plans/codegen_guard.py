"""Janino-64KB tripwire (r13, review r12 item 3).

The failure class: a regex/PSL chain fused into a HashAggregate key
or a pushed-down Filter generates ONE method janino cannot split;
compilation fails on EVERY run (~13 s/job of doomed compile work),
then Spark silently falls back to interpreted execution — CORRECT
results, hot-path 2-5× slower, invisible to every plan-pin test
(the r12 ``domain_link_graph`` finding was caught by reading stderr
by hand). The compile failure is only ever REPORTED as a driver
stderr log line::

    ERROR CodeGenerator: Failed to compile the generated Java code.
    org.codehaus.commons.compiler.InternalCompilerException: ...
    Code of method ... grows beyond 64 KB

This module makes that line machine-visible: install a process-level
fd-2 tee BEFORE the JVM starts (the JVM inherits fd 2 at launch —
log4j's console appender writes there), then ``advance()`` between
queries to attribute any compile-failure lines to the query that
produced them. bench.py installs it and publishes
``codegen_failures`` per query in the bench artifact; the driver-sim
recipe (.claude/skills/verify/SKILL.md) scans the same way, so the
r12 class of bug fails verification instead of costing a silent
~13 s/job at 100 TB.
"""

from __future__ import annotations

import os
import re
import sys
from typing import List

__all__ = [
    "CODEGEN_FAILURE_RX",
    "CodegenFailureMonitor",
    "scan_stderr_file",
]

#: Lines that mean "generated code failed to compile". Both spellings
#: appear depending on which layer reports first: CodeGenerator's
#: "Failed to compile" ERROR and janino's "grows beyond 64 KB" cause.
CODEGEN_FAILURE_RX = re.compile(
    r"Failed to compile the generated Java code"
    r"|grows beyond 64 KB"
    r"|Code of method .{0,200} grows beyond"
)


class CodegenFailureMonitor:
    """Tee fd 2 to a log file and scan it incrementally.

    Usage (MUST run before the first SparkSession — the JVM inherits
    the redirected fd at fork)::

        mon = CodegenFailureMonitor.install("/tmp/run_stderr.log")
        spark = SparkSession.builder...getOrCreate()
        ... run query ...
        hits = mon.advance()   # compile-failure lines since last call

    After ``install``, ``sys.stderr`` is rebound to a dup of the
    ORIGINAL stderr so Python-side messages still reach the console;
    only the fd-level stream (JVM log4j, C-level writes) lands in the
    log file."""

    def __init__(self, path: str):
        self.path = path
        self._pos = 0

    @classmethod
    def install(cls, path: str) -> "CodegenFailureMonitor":
        log_fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
        orig_fd = os.dup(2)
        os.dup2(log_fd, 2)
        os.close(log_fd)
        # line-buffered text wrapper over the preserved console fd
        sys.stderr = os.fdopen(orig_fd, "w", buffering=1)
        return cls(path)

    def advance(self) -> List[str]:
        """Compile-failure lines appended to the log since the last
        call (or since install). Non-matching lines are skipped; the
        read position always advances to EOF."""
        hits: List[str] = []
        try:
            with open(self.path, "rb") as fh:
                fh.seek(self._pos)
                data = fh.read()
                self._pos = fh.tell()
        except OSError:
            return hits
        for raw in data.splitlines():
            line = raw.decode("utf-8", "replace")
            if CODEGEN_FAILURE_RX.search(line):
                hits.append(line.strip()[:300])
        return hits

    def scan_all(self) -> List[str]:
        """Full-file scan, position-independent (for end-of-run
        summaries)."""
        pos, self._pos = self._pos, 0
        try:
            return self.advance()
        finally:
            self._pos = pos


def scan_stderr_file(path: str) -> List[str]:
    """One-shot helper for recipes that already captured stderr to a
    file (``python x.py 2>log``): the compile-failure lines in it."""
    return CodegenFailureMonitor(path).advance()
