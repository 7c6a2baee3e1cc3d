"""One-off diagnostic: attribute the scaling-efficiency shortfall.

Runs the interleaved scoring legs (no artifact writes) with the child's
per-pass cpuset CPU accounting and prints, per pass: wall sec, busy
cpu-seconds on the pinned cores, and utilization.  Splits the
efficiency gap into

* utilization gap — the 32-core leg leaves cores idle (scheduling,
  python-worker ramp, straggler tails), vs
* work inflation — cores are busy but the wide leg burns more
  cpu-seconds for the same pairs (allocator/bandwidth contention, GC).

Usage: RECON_SCALING_REPL=8 python tools/diag_scaling_cpu.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench_scaling import run_interleaved  # noqa: E402

lo, hi, pair_effs = run_interleaved(8, 32, int(os.environ.get("DIAG_PAGES", "150000")), "48g")

print(json.dumps({"pair_efficiencies": pair_effs}, indent=2))
for name, leg in (("low", lo), ("high", hi)):
    print(f"--- {name} (cores={leg['cores']}, median {leg['seconds']}s) ---")
    for p in leg["passes"]:
        print(
            f"  sec={p['sec']:>7} cpu_sec={p.get('cpu_sec', '?'):>7} "
            f"util={p.get('cpu_util', '?'):>6} gc_ms={p['gc_ms']:>6} "
            f"steal={p['steal_frac']} warm={p['warmup']} kept={p['kept']}"
        )
