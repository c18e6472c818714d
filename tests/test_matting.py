"""Background matting (utils/matting.py) — the in-repo stand-in for the
reference's rembg preprocessing (utils/background_removal.py): alpha
estimation on synthetic backdrop shots, and the image-to-3D loader
accepting a NON-pre-matted RGB fixture end-to-end."""

import numpy as np

from gsgen_tpu.utils.matting import ensure_rgba, estimate_alpha


def _shot(bg, noise=0.01, seed=0):
    """96x96 object-on-backdrop: a filled disc + a bar, with a
    background-colored HOLE inside the disc (tests border
    connectivity)."""
    rng = np.random.default_rng(seed)
    H = W = 96
    img = np.ones((H, W, 3), np.float32) * np.asarray(bg, np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    disc = (yy - 48) ** 2 + (xx - 40) ** 2 < 26 ** 2
    bar = (np.abs(yy - 50) < 5) & (xx > 40) & (xx < 88)
    hole = (yy - 48) ** 2 + (xx - 40) ** 2 < 7 ** 2
    fg = (disc | bar)
    img[fg] = np.asarray([0.75, 0.25, 0.2], np.float32)
    img[hole] = np.asarray(bg, np.float32)      # bg-colored interior
    img += rng.normal(0, noise, img.shape).astype(np.float32)
    return np.clip(img, 0, 1), fg


def test_alpha_on_white_backdrop():
    img, fg = _shot((0.97, 0.97, 0.97))
    a = estimate_alpha(img)
    got = a > 0.5
    iou = (got & fg).sum() / (got | fg).sum()
    assert iou > 0.93, iou


def test_alpha_on_colored_backdrop():
    img, fg = _shot((0.15, 0.55, 0.2))
    a = estimate_alpha(img)
    got = a > 0.5
    iou = (got & fg).sum() / (got | fg).sum()
    assert iou > 0.93, iou


def test_interior_background_color_stays_foreground():
    """The hole is backdrop-colored but NOT border-connected: flood
    fill must keep it foreground (rembg behaves the same way for
    enclosed regions)."""
    img, _ = _shot((0.97, 0.97, 0.97), noise=0.005)
    a = estimate_alpha(img)
    assert a[48, 40] > 0.5          # hole center
    assert a[2, 2] < 0.5            # corner background


def test_ensure_rgba_passthrough_and_matte():
    img, _ = _shot((0.97, 0.97, 0.97))
    rgba = ensure_rgba(img)
    assert rgba.shape[-1] == 4
    already = np.concatenate([img, np.ones(img.shape[:2] + (1,),
                                           np.float32)], -1)
    np.testing.assert_array_equal(ensure_rgba(already), already)


def test_sit3d_loader_accepts_unmatted_rgb(tmp_path):
    """build_trainer with an RGB (no alpha) image file: the auto-matte
    path produces the mask the sit3d init consumes."""
    import imageio.v2 as imageio

    from gsgen_tpu.config import build_trainer, load_config

    img, fg = _shot((0.97, 0.97, 0.97))
    p = tmp_path / "obj.png"
    imageio.imwrite(p, (img * 255).astype(np.uint8))
    cfg = load_config("configs/base.yaml", [
        "init.num_points=64", "init.capacity=256",
        "renderer.dup_cap=16384", "renderer.chunk=128",
        "trainer.batch_size=1", "data.reso=[96]",
        "guidance.type=mock",
    ])
    cfg["image"] = {"path": str(p), "distance": 2.5}
    tr = build_trainer(cfg)
    assert tr.image_target is not None
    mask = np.asarray(tr.image_target.mask)
    iou = (mask & fg).sum() / (mask | fg).sum()
    assert iou > 0.9, iou
