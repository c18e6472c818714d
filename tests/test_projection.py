import jax
import jax.numpy as jnp
import numpy as np

from gsgen_tpu.ops import projection as P
from gsgen_tpu.ops.camera import CameraIntrinsics, get_frustum
from gsgen_tpu.ops.transforms import normalize_quat


def lookat_c2w(eye, target=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)):
    """OpenCV-style c2w (x right, y down, z forward)."""
    eye = np.asarray(eye, np.float32)
    fwd = np.asarray(target, np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float32))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    return jnp.asarray(np.stack([right, down, fwd, eye], axis=1))


def test_world_to_camera_center():
    c2w = lookat_c2w((0.0, -2.0, 0.0))
    u = P.world_to_camera(jnp.zeros((1, 3)), c2w)
    np.testing.assert_allclose(u, jnp.array([[0.0, 0.0, 2.0]]), atol=1e-6)


def test_projection_center_lands_at_principal_point():
    c2w = lookat_c2w((0.0, -2.0, 0.0))
    mean = jnp.zeros((1, 3))
    qvec = jnp.array([[1.0, 0, 0, 0]])
    svec = jnp.full((1, 3), 0.1)
    proj = P.project_gaussians(mean, qvec, svec, c2w)
    np.testing.assert_allclose(proj.mean2d, 0.0, atol=1e-6)
    np.testing.assert_allclose(proj.depth, 2.0, atol=1e-6)
    assert bool(proj.in_front[0])


def test_isotropic_cov2d_is_scaled_identity():
    # isotropic gaussian at distance z: cov2d ~ (s/z)^2 I
    c2w = lookat_c2w((0.0, -4.0, 0.0))
    s = 0.2
    proj = P.project_gaussians(
        jnp.zeros((1, 3)), jnp.array([[1.0, 0, 0, 0]]), jnp.full((1, 3), s), c2w)
    expected = (s / 4.0) ** 2
    np.testing.assert_allclose(proj.cov2d[0], expected * jnp.eye(2), atol=1e-7)


def test_behind_camera_flagged():
    c2w = lookat_c2w((0.0, -2.0, 0.0))
    mean = jnp.array([[0.0, -5.0, 0.0]])  # behind the eye
    proj = P.project_gaussians(mean, jnp.array([[1.0, 0, 0, 0]]),
                               jnp.full((1, 3), 0.1), c2w)
    assert not bool(proj.in_front[0])
    assert np.isfinite(np.asarray(proj.mean2d)).all()


def test_detach_depth_gradient():
    c2w = lookat_c2w((0.0, -2.0, 0.0))
    qvec = jnp.array([[1.0, 0, 0, 0]])
    svec = jnp.full((1, 3), 0.1)

    def f(mean, detach):
        pr = P.project_gaussians(mean, qvec, svec, c2w, detach_depth=detach)
        return jnp.sum(pr.mean2d)

    m = jnp.array([[0.3, 0.0, 0.2]])
    g_detach = jax.grad(lambda m: f(m, True))(m)
    g_full = jax.grad(lambda m: f(m, False))(m)
    # moving along the view axis changes mean2d only in the full version
    assert abs(float(g_detach[0, 1])) < 1e-8
    assert abs(float(g_full[0, 1])) > 1e-4
    # depth remains differentiable in both cases
    gd = jax.grad(lambda m: jnp.sum(
        P.project_gaussians(m, qvec, svec, c2w, detach_depth=True).depth))(m)
    np.testing.assert_allclose(gd[0], jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_frustum_cull():
    intr = CameraIntrinsics.from_reso(64, near=0.1, far=10.0)
    c2w = lookat_c2w((0.0, -2.0, 0.0))
    mean = jnp.array([
        [0.0, 0.0, 0.0],    # center: visible
        [0.0, -20.0, 0.0],  # behind camera
        [50.0, 0.0, 0.0],   # far off to the side
        [0.0, 20.0, 0.0],   # beyond far plane
    ])
    svec = jnp.full((4, 3), 0.05)
    mask = P.frustum_cull_mask(mean, svec, c2w, intr, radius_thresh=6.0)
    assert mask.tolist() == [True, False, False, False]


def test_screen_radii():
    cov = jnp.array([[[4.0, 0.0], [0.0, 1.0]]])
    np.testing.assert_allclose(P.screen_radii(cov), jnp.array([4.0]), atol=1e-5)


def test_frustum_planes_contain_lookat_points():
    intr = CameraIntrinsics.from_reso(64, near=0.1, far=10.0)
    c2w = lookat_c2w((0.0, -2.0, 0.0))
    normals, pts = get_frustum(c2w, intr)
    from gsgen_tpu.ops.camera import in_frustum
    qs = jnp.array([
        [0.0, 0.0, 0.0],     # on axis, z = 2
        [0.0, 1.0, 0.0],     # on axis, z = 3
        [0.0, -1.95, 0.0],   # in front of the near plane (z = 0.05 < 0.1)
        [0.0, 9.0, 0.0],     # beyond the far plane (z = 11 > 10)
    ])
    assert in_frustum(qs, normals, pts).tolist() == [True, True, False, False]


def test_conic_exact_for_subpixel_gaussians():
    """det ~1e-13 is legitimate for sub-pixel Gaussians at 512^2; an
    absolute clamp used to inflate their rendered footprint ~2x.  The
    relative guard must leave them bit-faithful to the true inverse."""
    import numpy as np
    cov = jnp.array([[[1.1141742e-06, -1.2631280e-07],
                      [-1.2631280e-07, 4.4472958e-07]]])
    conic, det = P.conic_from_cov2d(cov)
    inv = np.linalg.inv(np.asarray(cov[0], np.float64))
    want = np.array([inv[0, 0], inv[0, 1], inv[1, 1]])
    np.testing.assert_allclose(np.asarray(conic[0]), want, rtol=1e-4)


def test_aabb_covers_rendered_support_subpixel():
    """Regression: the tile AABB must bound the ellipse of the CONIC the
    rasterizer evaluates.  A sub-pixel Gaussian near a tile boundary
    used to lose an above-1/255 contribution at the neighboring tile."""
    import numpy as np
    from gsgen_tpu.ops.binning import bin_gaussians
    from gsgen_tpu.ops.rasterize import rasterize_tiles
    from gsgen_tpu.ops.oracle import composite_dense, pixel_grid

    n, reso, tile, chunk = 64, 128, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    mean2d = jax.random.uniform(ks[0], (n, 2), minval=-0.45, maxval=0.45)
    # extremely anisotropic sub-pixel covariances: det down to ~1e-14
    sx = jnp.exp(jax.random.uniform(ks[1], (n,), minval=-16.0, maxval=-12.0))
    sy = jnp.exp(jax.random.uniform(ks[2], (n,), minval=-16.0, maxval=-12.0))
    th = jax.random.uniform(ks[3], (n,), minval=0.0, maxval=3.14)
    ct, st = jnp.cos(th), jnp.sin(th)
    r = jnp.stack([jnp.stack([ct, -st], -1), jnp.stack([st, ct], -1)], -2)
    cov2d = jnp.einsum("nij,nj,nkj->nik", r, jnp.stack([sx, sy], -1), r)
    depth = jax.random.uniform(ks[4], (n,), minval=1.0, maxval=4.0)
    alpha = jnp.full((n,), 0.8)
    feats = jnp.concatenate(
        [jax.random.uniform(jax.random.PRNGKey(12), (n, 3)),
         jnp.ones((n, 1))], -1)
    active = jnp.ones((n,), bool)
    f = float(reso)
    conic, _ = P.conic_from_cov2d(cov2d)
    bins = bin_gaussians(mean2d, cov2d, depth, active,
                         fx=f, fy=f, cx=f / 2, cy=f / 2, w=reso, h=reso,
                         tile_size=tile, cap=8192, chunk=chunk,
                         tile_culling_radius=12.0, alpha=alpha)
    img, T = rasterize_tiles(mean2d, conic, alpha, feats, bins,
                             (-0.5, -0.5), (1.0 / f, 1.0 / f),
                             w=reso, h=reso, tile_size=tile, chunk=chunk)
    pix = pixel_grid((-0.5, -0.5), (1.0 / f, 1.0 / f), reso, reso)
    want, T_want = composite_dense(mean2d, conic, alpha, feats, depth,
                                   active, pix, 1e-4)
    np.testing.assert_allclose(np.asarray(img).reshape(-1, 4),
                               np.asarray(want), rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(T).reshape(-1),
                               np.asarray(T_want), rtol=1e-3, atol=3e-4)
