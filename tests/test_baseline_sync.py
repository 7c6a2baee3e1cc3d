"""BASELINE.md achieved-numbers must equal the committed bench artifact
(round-4 verdict #2: hand-refreshed prose drifted from BENCH_r*.json in
two consecutive rounds; bench.py is now the only writer and this test
pins the sync)."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_headline_block_matches_artifact():
    from check_headline_sync import check

    msg = check(REPO)
    # SKIP (no artifact yet) is acceptable only before the first sf0.1
    # bench run; once BENCH/headline.json is committed this asserts
    # byte-equality of the rendered block.
    assert msg.startswith(("OK", "SKIP")), msg
