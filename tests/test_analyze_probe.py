"""tools/analyze_probe.py selection semantics.

The relay-return runbook trusts this tool to pick which kernel route
becomes the shipped default after the on-chip probe
(tools/probe_fused_mlp.py) — a wrong pick would ship a Mosaic-miscompiled
variant, so the guard logic is pinned here: min-slope wins, but only among
variants whose first-step loss/grad-norm stayed inside the split guard
tolerances (loss 5e-3 tight; gnorm 2e-2, wide enough for legitimate LN
reassociation, measured ~5.5e-3 by the probe's --smoke mode), and explicit
PROBE_GUARD_FAIL / error records disqualify outright.
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "analyze_probe", REPO / "tools" / "analyze_probe.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _log(tmp_path, records):
    p = tmp_path / "probe.log"
    p.write_text("\n".join(json.dumps(r) for r in records) + "\n")
    return str(p)


def _variant(name, slope, loss=0.64, gnorm=2.20):
    return [{"variant": name, "first_loss": loss, "first_gnorm": gnorm},
            {"workload": f"mim_step_{name}", "slope_ms_per_iter": slope,
             "intercept_ms": 27.0}]


def test_min_slope_passing_variant_wins(tmp_path, capsys, monkeypatch):
    ap = _load()
    recs = (_variant("baseline", 49.7)
            + _variant("gelu", 42.0)
            + _variant("kernel", 40.0, gnorm=2.20 * 1.03)  # 3% gnorm drift
            + _variant("savep", 45.0))
    monkeypatch.setattr(sys, "argv", ["analyze_probe.py",
                                      _log(tmp_path, recs)])
    assert ap.main() == 0
    out = capsys.readouterr().out
    # kernel has the min slope but fails the gnorm guard; gelu ships
    assert "winner: gelu at 42.00 ms/iter" in out
    assert "_SHIPPED_MLP_REMAT = 'gelu'" in out
    assert "GUARD FAIL" in out  # the kernel row is flagged


def test_small_gnorm_reassociation_drift_is_tolerated(tmp_path, capsys,
                                                      monkeypatch):
    ap = _load()
    # 0.5% gnorm drift = the measured lnqkv reassociation scale: must pass
    recs = (_variant("baseline", 49.7)
            + _variant("kernel+lnqkv+savep", 38.0, gnorm=2.20 * 1.005))
    monkeypatch.setattr(sys, "argv", ["analyze_probe.py",
                                      _log(tmp_path, recs)])
    assert ap.main() == 0
    out = capsys.readouterr().out
    assert "winner: kernel+lnqkv+savep" in out
    assert "_SHIPPED_MLP_REMAT = 'kernel'" in out
    assert "_SHIPPED_LN_QKV   = 'kernel'" in out
    assert "_SHIPPED_SAVE_P = True" in out


def test_loss_drift_disqualifies_even_when_fast(tmp_path, capsys,
                                                monkeypatch):
    ap = _load()
    recs = (_variant("baseline", 49.7)
            + _variant("kernel", 30.0, loss=0.64 * 1.02))  # 2% loss drift
    monkeypatch.setattr(sys, "argv", ["analyze_probe.py",
                                      _log(tmp_path, recs)])
    assert ap.main() == 0
    out = capsys.readouterr().out
    assert "winner: baseline" in out
    assert "(baseline won — leave the shipped defaults as they are)" in out


def test_explicit_guard_fail_and_errors_disqualify(tmp_path, capsys,
                                                   monkeypatch):
    ap = _load()
    recs = (_variant("baseline", 49.7)
            + _variant("gelu", 40.0)
            + [{"PROBE_GUARD_FAIL": "gelu", "first_step": [1, 1],
                "baseline": [1, 1], "note": "x"}]
            + [{"workload": "mim_step_kernel",
                "error": "XlaRuntimeError('boom')"}])
    monkeypatch.setattr(sys, "argv", ["analyze_probe.py",
                                      _log(tmp_path, recs)])
    assert ap.main() == 0
    out = capsys.readouterr().out
    assert "winner: baseline" in out
    assert "ERROR: XlaRuntimeError" in out


def test_no_passing_variant_keeps_defaults_rc1(tmp_path, capsys, monkeypatch):
    ap = _load()
    recs = (_variant("baseline", 49.7)
            + [{"PROBE_GUARD_FAIL": "baseline", "first_step": [1, 1],
                "baseline": [1, 1], "note": "x"}])
    monkeypatch.setattr(sys, "argv", ["analyze_probe.py",
                                      _log(tmp_path, recs)])
    assert ap.main() == 1
    assert "keep the shipped defaults" in capsys.readouterr().out
