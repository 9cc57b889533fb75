"""HLO collective-byte accounting (scripts/analyze_multichip.py) — the
multi-chip scaling model's measured-comm input must parse real HLO
instruction syntax (tuple results, {layout} suffixes, named references)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from analyze_multichip import _shape_bytes, collective_bytes

HLO = """
ENTRY %main {
  %collective-permute.1 = s32[1,256]{1,0} collective-permute(%x), channel_id=2
  %all-reduce.30 = (f32[1,256]{1,0}, f32[256,294]{1,0}) all-reduce(%a, %b), channel_id=3
  %get-tuple-element.1 = f32[1,256]{1,0} get-tuple-element(%all-reduce.30), index=0
  %fusion.2 = f32[8,8]{1,0} fusion(%collective-permute.1, %c), kind=kLoop
  %all-gather.5 = bf16[16,1024,8]{2,1,0} all-gather(%d), dimensions={1}
  %ag-start = f32[4]{0} all-gather-start(%e)
}
"""


def test_shape_bytes():
    assert _shape_bytes("f32[1,256]") == 1024
    assert _shape_bytes("bf16[16,1024,8]") == 16 * 1024 * 8 * 2
    assert _shape_bytes("pred[7]") == 7


def test_collective_bytes_parses_instructions_not_references():
    out = collective_bytes(HLO)
    # permute: one s32[1,256] = 1024 B
    assert out["collective-permute"] == {"ops": 1, "bytes": 1024}
    # all-reduce tuple: f32[1,256] + f32[256,294]
    assert out["all-reduce"]["ops"] == 1
    assert out["all-reduce"]["bytes"] == 4 * (256 + 256 * 294)
    # all-gather (the -start form counts too); the get-tuple-element and
    # fusion lines REFERENCING collectives must not count.
    assert out["all-gather"]["ops"] == 2
    assert out["all-gather"]["bytes"] == 16 * 1024 * 8 * 2 + 16
