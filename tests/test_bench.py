"""bench.py smoke: the driver runs it at round end — it must always emit
one valid JSON line (CPU fallback path: reverb_small, B=2)."""

import json


def test_bench_emits_one_json_line(capsys):
    import bench
    bench.main()
    out = [l for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith('{')]
    assert len(out) == 1, out
    rec = json.loads(out[0])
    assert {'metric', 'value', 'unit', 'vs_baseline'} <= set(rec)
    assert rec['value'] > 0
