"""bench.py smoke: the driver runs it at round end under a bounded wall
clock — it must emit the headline JSON line quickly and unconditionally
(CPU fallback path: reverb_small, B=2).  Round-3 regression: the headline
used to print only AFTER ~60 min of submetric subprocesses, so BENCH_r03
captured nothing (rc 124).  The contract now: FIRST printed JSON line is a
complete headline record, flushed before any submetric work."""

import json
import time


def test_bench_headline_first_and_bounded(capsys, monkeypatch):
    monkeypatch.setenv('REVERB_BENCH_BUDGET_S', '540')
    import bench
    t0 = time.perf_counter()
    bench.main()
    wall = time.perf_counter() - t0
    out = [l for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith('{')]
    assert len(out) >= 1, out
    rec = json.loads(out[0])   # FIRST line is already the full headline
    assert {'metric', 'value', 'unit', 'vs_baseline',
            'runs_xrt', 'warmup_s'} <= set(rec)
    assert rec['value'] > 0
    # bounded: the CPU fallback (small model, B=2, 2 runs) must leave ample
    # headroom under any sane driver timeout
    assert wall < 300, f'bench CPU path took {wall:.0f}s'
