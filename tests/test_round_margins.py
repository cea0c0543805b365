"""The transcendental allowlist's justification, enforced.

TRANSCENDENTAL_ALLOWLIST entries (plans/driver_queries.py) claim their
libm-derived hash-compared columns sit far from every round(x, 6)
boundary — the condition under which a driver-box libm ULP cannot flip
a value (the tx14 r05/r06 defect class).  This test RUNS the audit
(scripts/audit_round_margins.py: strip output-only rounds, measure
boundary distances on DuckDB) at the driver's gate scale, so the
justification is re-proven on every test run, not a one-time NOTES
claim.  DuckDB-only — no Spark session, runs in seconds.
"""

import importlib.util
import io
import json
import os
import sys

import pytest

_SF = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(_SF), reason="sf0.01 testdata absent")
def test_margin_audit_passes_at_gate_scale(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "audit_round_margins",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "audit_round_margins.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setattr(mod, "SF_DIR", _SF)
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    rc = mod.main()
    sys.stdout = sys.__stdout__
    lines = [json.loads(ln) for ln in out.getvalue().splitlines()]
    assert rc == 0, lines
    per_query = [ln for ln in lines if "query" in ln]
    assert len(per_query) == len(mod.AUDITED)
    for row in per_query:
        assert row["ok"], row
        # each query must actually have emitted float values to audit
        assert row["n_float_values"] > 0, row
