"""Bench stamping: perf-table freshness must be mechanically checkable
(VERDICT r4 #4 — the round-4 ROOFLINE prose epoch note rotted within one
round). Two guards:

* GATE_DEFAULTS in utils/envflags.py is pinned to the literal default at
  every kernel_gate call site, so gate_state() cannot drift from the code.
* Every `<!-- bench-stamp: ... -->` comment embedded in perf/ROOFLINE.md
  must either carry today's gate defaults or an explicit `stale=<reason>`
  marker; flipping a gate default without re-measuring (or explicitly
  declaring the staleness) breaks the suite.
"""

import os
import re

from vit_cnn_tpu.utils.envflags import (GATE_DEFAULTS, bench_stamp,
                                        gate_state, stamp_str)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CALL_SITES = {
    "VCT_LANE_MAJOR": "vit_cnn_tpu/nn/mamba.py",
    "VCT_HEADS_ATTN": "vit_cnn_tpu/nn/transformer.py",
    "VCT_POOLED_ATTN": "vit_cnn_tpu/ops/attention.py",
    "VCT_DIRSTREAM_FUSED_BWD": "vit_cnn_tpu/ops/dirstream.py",
    "VCT_LN_GROUPS_MM": "vit_cnn_tpu/ops/attention.py",
}


def test_gate_defaults_match_call_sites():
    assert set(CALL_SITES) == set(GATE_DEFAULTS)
    for name, rel in CALL_SITES.items():
        with open(os.path.join(REPO, rel)) as f:
            src = f.read()
        found = re.findall(r'kernel_gate\("%s",\s*"([^"]+)"\)' % name, src)
        assert found, f"{name}: no kernel_gate call in {rel}"
        for default in found:
            assert default == GATE_DEFAULTS[name], (
                f"{name}: call-site default {default!r} in {rel} != "
                f"GATE_DEFAULTS {GATE_DEFAULTS[name]!r} — update the "
                "registry AND re-measure stamped tables")


def test_gate_state_and_stamp_shape(monkeypatch):
    for k in GATE_DEFAULTS:
        monkeypatch.delenv(k, raising=False)
    assert gate_state() == GATE_DEFAULTS
    monkeypatch.setenv("VCT_POOLED_ATTN", "force")
    assert gate_state()["VCT_POOLED_ATTN"] == "force"

    st = bench_stamp()
    assert set(st) == {"git_sha", "dirty", "gates"}
    line = stamp_str(st)
    assert line.startswith("sha=") and "gates=" in line
    # the stamp string sorts gates so embedded stamps diff stably
    gates_part = line.split("gates=")[1]
    names = [g.split(":")[0] for g in gates_part.split(",")]
    assert names == sorted(names)


STAMP_RE = re.compile(
    r"<!-- bench-stamp: table=(\S+) sha=(\S+) gates=(\S+?)"
    r"(?: stale=(\S+))? -->")

# tables that MUST carry a stamp in perf/ROOFLINE.md; grow this set as
# more tables adopt stamping
REQUIRED_TABLES = {"headline", "models"}


def test_roofline_stamps_current_or_explicitly_stale():
    with open(os.path.join(REPO, "perf", "ROOFLINE.md")) as f:
        text = f.read()
    stamps = STAMP_RE.findall(text)
    tables = {t for t, _, _, _ in stamps}
    missing = REQUIRED_TABLES - tables
    assert not missing, (
        f"perf/ROOFLINE.md lost bench-stamp comments for {missing} — "
        "every perf table must be stamped with the code epoch it was "
        "measured at")
    current = {k[4:]: v for k, v in GATE_DEFAULTS.items()}
    for table, sha, gates, stale in stamps:
        got = dict(g.split(":") for g in gates.split(","))
        if stale:
            # staleness is allowed only when loudly declared, never silent
            continue
        assert got == current, (
            f"ROOFLINE table {table!r} (sha={sha}) was measured under "
            f"gates {got} but today's defaults are {current}: re-measure "
            "the table or mark its stamp stale=<reason>")
