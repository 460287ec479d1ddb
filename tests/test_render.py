"""Rasteriser correctness: analytic scenes + finite-difference gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.render.raster_jax import project_to_screen, rasterize_face_id
from hifihr_tpu.render.interpolate import barycentric_coords, interpolate_attribute
from hifihr_tpu.render.mesh import vertex_normals, uniform_laplacian
from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings
from hifihr_tpu.render.shading import DirectionalLight

S = 32  # tiny image for CPU tests


def _ortho_K(size):
    # focal=size, principal at center: x in [-0.5, 0.5] at z=1 spans the image
    return jnp.asarray([[[float(size), 0, size / 2], [0, float(size), size / 2], [0, 0, 1]]])


def test_project_to_screen_center():
    K = _ortho_K(S)
    v = jnp.asarray([[[0.0, 0.0, 1.0]]])
    sc = np.asarray(project_to_screen(v, K))
    np.testing.assert_allclose(sc[0, 0, :2], [S / 2, S / 2], atol=1e-5)


def test_single_triangle_coverage():
    K = _ortho_K(S)
    # big triangle around the center at depth 1
    verts = jnp.asarray([[[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.45, 1.0]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    vs = project_to_screen(verts, K)
    fid, zbuf = rasterize_face_id(vs, faces, S, chunk=4)
    fid, zbuf = np.asarray(fid), np.asarray(zbuf)
    # center pixel covered, corners not
    assert fid[0, S // 2, S // 2] == 0
    assert fid[0, 0, 0] == -1 and fid[0, -1, -1] == -1
    assert abs(zbuf[0, S // 2, S // 2] - 1.0) < 1e-5
    # coverage fraction ~ area: triangle area 0.8*0.85/2=0.34 of [-0.5,.5]^2
    frac = (fid[0] >= 0).mean()
    assert 0.25 < frac < 0.45


def test_depth_ordering():
    K = _ortho_K(S)
    tri_near = [[-0.4, -0.4, 0.5], [0.4, -0.4, 0.5], [0.0, 0.45, 0.5]]
    tri_far = [[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.45, 1.0]]
    verts = jnp.asarray([tri_far + tri_near])  # far face first
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    vs = project_to_screen(verts, K)
    fid, zbuf = rasterize_face_id(vs, faces, S, chunk=4)
    assert np.asarray(fid)[0, S // 2, S // 2] == 1  # nearer triangle wins
    # note: near tri at z=0.5 projects twice as large; its bbox covers center
    assert abs(np.asarray(zbuf)[0, S // 2, S // 2] - 0.5) < 1e-5


def test_barycentric_interpolation_linear_attr():
    """Interpolating the vertex positions themselves must reproduce the
    camera-space point under perspective-correct barycentrics."""
    K = _ortho_K(S)
    verts = jnp.asarray([[[-0.4, -0.4, 0.8], [0.4, -0.4, 1.3], [0.0, 0.45, 1.0]]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    vs = project_to_screen(verts, K)
    fid, _ = rasterize_face_id(vs, faces, S, chunk=4)
    frag = barycentric_coords(fid, vs, faces)
    pts = np.asarray(interpolate_attribute(frag, verts))
    # reproject interpolated points: should land on the pixel center
    cov = np.asarray(fid[0]) >= 0
    ys, xs = np.nonzero(cov)
    K_np = np.asarray(K[0])
    for y, x in list(zip(ys, xs))[:: max(1, len(ys) // 8)]:
        p = pts[0, y, x]
        u = K_np[0, 0] * p[0] / p[2] + K_np[0, 2]
        v = K_np[1, 1] * p[1] / p[2] + K_np[1, 2]
        assert abs(u - (x + 0.5)) < 1e-3 and abs(v - (y + 0.5)) < 1e-3


def test_render_rgba_and_gradients():
    K = _ortho_K(S)
    verts = jnp.asarray([[[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.45, 1.0]]])
    faces = np.asarray([[0, 1, 2]], np.int32)
    colors = jnp.ones_like(verts) * jnp.asarray([1.0, 0.5, 0.25])
    renderer = PhongRenderer(faces, RenderSettings(image_size=S, aa_factor=2, backend="jax", face_chunk=4))

    def render_sum(v):
        rgba = renderer(v, colors, K)
        return jnp.sum(rgba[..., :3]), rgba

    (val, rgba), grad = jax.value_and_grad(render_sum, has_aux=True)(verts)
    rgba = np.asarray(rgba)
    assert rgba.shape == (1, S, S, 4)
    assert rgba[..., 3].max() == 1.0
    assert np.all(np.isfinite(np.asarray(grad)))
    # moving a vertex changes shading/coverage -> nonzero grad
    assert float(jnp.abs(grad).max()) > 0

    # finite-difference check on the albedo path (smooth, so FD is meaningful)
    def albedo_mean(c):
        return jnp.mean(renderer(verts, c, K)[..., :3])

    g = jax.grad(albedo_mean)(colors)
    eps = 1e-3
    c2 = colors.at[0, 0, 0].add(eps)
    fd = (albedo_mean(c2) - albedo_mean(colors)) / eps
    np.testing.assert_allclose(float(g[0, 0, 0]), float(fd), rtol=2e-2)


def test_morton_sort_render_invariance():
    """sort_template reorders faces internally (raster bin-occupancy
    optimization, renderer.morton_face_order); the rendered image must be
    IDENTICAL to the unsorted renderer — face ids are renderer-internal."""
    from hifihr_tpu.render.renderer import morton_face_order

    K = _ortho_K(S)
    rng = np.random.RandomState(3)
    # small fan of depth-separated triangles so z-resolve order matters
    verts = jnp.asarray(rng.rand(1, 12, 3).astype(np.float32) * 0.7 - 0.35)
    verts = verts.at[..., 2].set(1.0 + jnp.abs(verts[..., 2]))
    faces = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]], np.int32)
    colors = jnp.asarray(rng.rand(1, 12, 3).astype(np.float32))
    settings = RenderSettings(image_size=S, aa_factor=2, backend="jax",
                              face_chunk=4, aa_mode="msaa")
    base = PhongRenderer(faces, settings)
    sorted_r = PhongRenderer(faces, settings, sort_template=np.asarray(verts[0]))
    order = morton_face_order(np.asarray(verts[0]), faces)
    assert sorted(order.tolist()) == [0, 1, 2, 3]
    np.testing.assert_array_equal(
        np.asarray(sorted_r.faces), faces[order])
    out_a = np.asarray(base(verts, colors, K))
    out_b = np.asarray(sorted_r(verts, colors, K))
    np.testing.assert_allclose(out_a, out_b, atol=1e-6)


def test_msaa_sliver_gradient_bounded():
    """Degenerate-face gradient guard (interpolate.fragment_interpolate):
    an MSAA-selected sliver face (area -> 0) must NOT produce exploding
    gradients to vertices.  Unguarded, w = e/area gives ~1/area gradients —
    measured 1e27 on TPU, which overflowed Adam's second moment to inf and
    permanently froze encoder params (aa-equivalence MSAA arm plateaued at
    PA-MPJPE ~1.8 vs SSAA 0.57)."""
    from hifihr_tpu.render.interpolate import fragment_interpolate

    K = _ortho_K(S)
    # a sub-1e-4-px^2 sliver plus a healthy face; force the sliver to be
    # selected at a pixel by handing face_id directly (MSAA-style selection
    # covers pixels whose centre lies outside the face)
    verts = jnp.asarray(
        [[[-1.5 / S, 0.160 / S, 1.0],
          [1.5 / S, 0.1601 / S, 1.0],
          [-1.5 / S, 0.1602 / S, 1.0],
          [-0.3, -0.3, 1.2], [0.3, -0.3, 1.2], [0.0, 0.35, 1.2]]]
    )
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    face_id = jnp.full((1, S, S), -1, jnp.int32)
    face_id = face_id.at[0, S // 2, S // 2].set(0)   # the sliver
    face_id = face_id.at[0, S // 2 + 2, S // 2].set(1)  # the healthy face

    def f(verts):
        from hifihr_tpu.render.raster_jax import project_to_screen

        vs = project_to_screen(verts, K)
        attrs = jnp.concatenate([verts, verts], axis=-1)  # any 6 channels
        pix, mask, zbuf = fragment_interpolate(face_id, vs, faces, attrs)
        return jnp.sum(pix ** 2) + jnp.sum(jnp.where(mask > 0, zbuf, 0.0))

    g = np.asarray(jax.grad(f)(verts))
    assert np.isfinite(g).all()
    assert np.abs(g).max() < 1e4, f"exploding sliver gradient: {np.abs(g).max()}"
    assert np.abs(g[0, 3:]).sum() > 0  # the healthy face still gets gradient


def test_vertex_normals_flat_quad():
    verts = jnp.asarray([[[0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]])
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    n = np.asarray(vertex_normals(verts, faces))
    np.testing.assert_allclose(np.abs(n[0, :, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(n[0, :, :2], 0.0, atol=1e-6)


def test_uniform_laplacian_flat():
    # on a straight line of equal spacing the uniform laplacian ~ 0 interior
    faces = np.asarray([[0, 1, 2], [1, 2, 3]], np.int32)
    L = np.asarray(uniform_laplacian(4, faces))
    verts = np.asarray([[0.0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]])
    lap = L @ verts
    # vertex 1 neighbors: 0,2,3 -> mean (5/3) - 1 = 2/3
    np.testing.assert_allclose(lap[1, 0], 5 / 3 - 1, atol=1e-6)


def test_tiny_valid_face_attrs_exact():
    """ADVICE r2: a tiny-but-valid face (~1 px) whose pixel-center
    barycentrics stay within the sliver-guard window must interpolate
    attributes EXACTLY (the clip(-4, 5) guard must be identity here), even
    though the face is close to the guard's design regime."""
    K = _ortho_K(S)
    # ~1.3 px triangle centered on pixel (16, 16)'s center at z=1
    e = 1.3 / S
    verts = jnp.asarray(
        [[[0.0 + 0.5 / S, 0.0 + 0.5 / S, 1.0],
          [e + 0.5 / S, 0.0 + 0.5 / S, 1.0],
          [0.0 + 0.5 / S, e + 0.5 / S, 1.0]]]
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    vs = project_to_screen(verts, K)
    fid, _ = rasterize_face_id(vs, faces, S, chunk=4)
    cov = np.asarray(fid[0]) >= 0
    assert cov.sum() >= 1  # the face does win at least one pixel center
    frag = barycentric_coords(fid, vs, faces)
    bary = np.asarray(frag["bary"][0])[cov]
    # pixel centers inside the face -> genuine convex weights, guard inert
    assert (bary > -1e-5).all() and (bary < 1 + 1e-5).all()
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)
    pts = np.asarray(interpolate_attribute(frag, verts))[0][cov]
    K_np = np.asarray(K[0])
    ys, xs = np.nonzero(cov)
    for (y, x), p in zip(zip(ys, xs), pts):
        u = K_np[0, 0] * p[0] / p[2] + K_np[0, 2]
        v = K_np[1, 1] * p[1] / p[2] + K_np[1, 2]
        assert abs(u - (x + 0.5)) < 1e-3 and abs(v - (y + 0.5)) < 1e-3


def test_subpixel_sliver_face_bounded():
    """A sub-pixel sliver that wins a pixel whose center lies OUTSIDE it must
    produce bounded interpolated attributes (clip window [-4, 5]): attrs stay
    within 6x the corner-attr range instead of exploding as area -> 0.

    Center-outside-but-selected only happens under MSAA selection (a face
    covering any SUBSAMPLE owns the pixel, raster_msaa.py), so the face id
    comes from the MSAA-emulation reduce: supersampled center rasterisation
    + nearest-z pooling — the exact non-TPU path of
    PhongRenderer._select_faces_msaa."""
    K = _ortho_K(S)
    a = 3
    # degenerate-thin sliver: ~0.008 px tall, 3 px wide, threaded through the
    # 1/6 SUBSAMPLE row of pixel row 16 (3x3 grid centers sit at offsets
    # 1/6, 1/2, 5/6) while missing every base pixel center at offset 1/2
    verts = jnp.asarray(
        [[[-1.5 / S, 0.160 / S, 1.0],
          [1.5 / S, 0.170 / S, 1.0],
          [-1.5 / S, 0.175 / S, 1.0]]]
    )
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    # base-res centers never land inside it: the legacy center-only selection
    # must produce zero coverage (this is WHY the MSAA reduce is needed)
    vs = project_to_screen(verts, K)
    fid_center, _ = rasterize_face_id(vs, faces, S, chunk=4)
    assert not (np.asarray(fid_center) >= 0).any()
    # MSAA-style selection: supersample, pick nearest covering face per pixel
    K_big = K * jnp.asarray([[a, 1, a], [1, a, a], [1, 1, 1]], K.dtype)
    vs_big = project_to_screen(verts, K_big)
    fid_big, z_big = rasterize_face_id(vs_big, faces, S * a, chunk=4)
    fid_blk = np.asarray(fid_big).reshape(1, S, a, S, a).transpose(0, 1, 3, 2, 4)
    z_blk = np.asarray(z_big).reshape(1, S, a, S, a).transpose(0, 1, 3, 2, 4)
    nearest = z_blk.reshape(1, S, S, a * a).argmin(-1)
    fid = np.take_along_axis(
        fid_blk.reshape(1, S, S, a * a), nearest[..., None], axis=-1
    )[..., 0].astype(np.int32)
    assert (fid >= 0).any()  # guard against vacuity: the sliver DOES win pixels
    frag = barycentric_coords(jnp.asarray(fid), vs, faces)
    bary = np.asarray(frag["bary"])[fid >= 0]
    # the guard must actually fire: an unclipped sliver barycentric at a
    # center ~0.3 px from a 0.02 px face is O(10); clipping pins it to ±window
    assert ((bary == -4.0) | (bary == 5.0)).any()
    attrs = jnp.asarray([[[0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.5, 1.0, 1.0]]])
    out = np.asarray(interpolate_attribute(frag, attrs))
    assert np.isfinite(out).all()
    assert np.abs(out).max() <= 6.0  # |clip| * max|attr| bound, not unbounded
