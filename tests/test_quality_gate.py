"""CI'd quality gate (VERDICT r4 item 6): the synthetic-teacher
reconstruction that `tools/demo_recon` runs manually, promoted to a
THRESHOLDED test.  Kernels keep being rewritten (r3 MXU scans, r4 rank
kernel + MXU prefix, r5 lax.map batching); loss curves prove finiteness
but only an end-metric catches a silently-degraded gradient.

CPU tier (default, slow): short run, reduced-but-real threshold.
Chip tier (GSGEN_TEST_TPU=1): the full 400-step recipe must reach the
29 dB the round-3/4 records established (29.43 / 29.56 dB).
"""

import os

import pytest

ON_TPU = bool(os.environ.get("GSGEN_TEST_TPU"))


def _run(steps: int, tmp_path):
    from gsgen_tpu.tools.demo_recon import main
    return main(out_path=str(tmp_path / "recon.png"), steps=steps)


def test_recon_quality_gate(tmp_path):
    if ON_TPU:
        # full recipe on the chip: the 29 dB bar from BASELINE.md
        psnr = _run(400, tmp_path)
        assert psnr >= 29.0, f"chip recon gate: {psnr:.2f} dB < 29.0"
    else:
        # CPU tier: 150 steps of the same pipeline.  Measured ~24.9 dB
        # at this budget; 23 dB still requires working geometry+color
        # gradients and live densify (a broken backward lands <15 dB)
        psnr = _run(150, tmp_path)
        assert psnr >= 23.0, f"cpu recon gate: {psnr:.2f} dB < 23.0"
