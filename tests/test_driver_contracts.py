"""Driver-facing contracts: __graft_entry__ and bench.py.

The build driver compile-checks ``entry()``, executes
``dryrun_multichip(n)``, and parses bench.py's single JSON line; these
tests pin those surfaces so a refactor can't silently break the
scoreboard. Runs on the 8-virtual-device CPU mesh from conftest.
"""

import io
import json
import sys
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

import jax
import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


@pytest.mark.slow
def test_entry_returns_jittable_forward():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)  # driver compile-checks this
    assert lowered is not None
    assert args[0].shape == (8, 224, 224, 3)


@pytest.mark.slow
def test_dryrun_multichip_in_process():
    """With enough visible devices the dry run executes directly and emits
    the machine-parseable JSON line."""
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    buf = io.StringIO()
    with redirect_stdout(buf):
        g.dryrun_multichip(8)
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    rec = json.loads(lines[-1])
    assert rec["dryrun_multichip"] == "ok"
    assert rec["n_devices"] == 8
    assert rec["mesh"] == {"data": 4, "model": 2}


@pytest.mark.slow
def test_bench_sharded_contract(monkeypatch, capsys):
    """bench.py main() on the virtual mesh prints ONE JSON line with the
    driver's schema; the sharded path reports aggregate + per-chip."""
    import bench

    monkeypatch.setattr(
        sys, "argv",
        ["bench.py", "--batch", "2", "--iters", "1", "--sharded",
         "--model", "resnet_tiny", "--size", "32"],
    )
    err = io.StringIO()
    with redirect_stderr(err):
        bench.main()
    out_lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    assert len(out_lines) == 1
    rec = json.loads(out_lines[0])
    for k in ("metric", "value", "unit", "vs_baseline", "aggregate_ex_per_s",
              "batch", "sharded", "n_chips",
              # self-documenting roofline context (VERDICT r4 #8)
              "fwd_img_per_s", "roofline_ceiling_ex_per_s", "roofline_frac",
              "roofline_ref"):
        assert k in rec, k
    assert rec["unit"] == "examples/sec/chip"
    assert rec["sharded"] is True
    assert rec["n_chips"] == len(jax.devices())
    assert rec["value"] > 0
    # value is rounded to 1 decimal in the JSON line
    assert rec["value"] == pytest.approx(rec["aggregate_ex_per_s"] / rec["n_chips"],
                                         abs=0.051)
