"""NIMBLE UV-texture pipeline: bilinear sampling, textured render parity and
gradients, PCA texture image, textured OBJ export (VERDICT r1 item 3;
reference models_res_nimble.py:132-142, visualize_util.py:16,27)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifihr_tpu.render.texture import cylindrical_uv, sample_texture


def test_sample_texture_bilinear_exact():
    # 2x2 texel map, known analytic bilinear values
    tex = jnp.asarray(
        [[[[0.0, 0, 0], [1.0, 0, 0]],
          [[0.0, 1, 0], [1.0, 1, 0]]]], jnp.float32)  # (1,2,2,3)
    uv = jnp.asarray([[[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.5, 0.5]]]])
    out = np.asarray(sample_texture(tex, uv))[0, 0]
    np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(out[3], [0.5, 0.5, 0], atol=1e-6)


def test_sample_texture_gradient_flows():
    tex = jnp.ones((1, 4, 4, 3)) * 0.5
    uv = jnp.asarray([[[[0.3, 0.6]]]])

    def f(t):
        return jnp.sum(sample_texture(t, uv))

    g = jax.grad(f)(tex)
    assert float(jnp.sum(jnp.abs(g))) > 0
    # bilinear weights sum to 1 per sampled point and channel
    np.testing.assert_allclose(float(jnp.sum(g)), 3.0, atol=1e-5)


def test_cylindrical_uv_in_range():
    rng = np.random.RandomState(0)
    verts = jnp.asarray(rng.randn(100, 3).astype(np.float32))
    uv = np.asarray(cylindrical_uv(verts))
    assert uv.shape == (100, 2)
    assert (uv >= 0).all() and (uv <= 1).all()


def test_nimble_layer_emits_uv_texture_image():
    from hifihr_tpu.hand.nimble import NimbleLayer

    layer = NimbleLayer(tex_size=64)
    assert layer.vert_uv is not None, "UV asset missing — run tools/make_nimble_uv.py"
    B = 2
    params = {
        "pose_params": jnp.zeros((B, 30)),
        "shape_params": jnp.zeros((B, 20)),
        "texture_params": jnp.asarray(np.random.RandomState(0).randn(B, 10), jnp.float32),
    }
    out = layer(params)
    # full appearance stack: diffuse(3) + tangent-space normal(3) + spec(1)
    assert out["textures"].shape == (B, 64, 64, 7)
    tex = np.asarray(out["textures"])
    assert (tex >= 0).all() and (tex <= 1).all()
    # PCA coefficients actually modulate the map
    out0 = layer({**params, "texture_params": jnp.zeros((B, 10))})
    assert float(jnp.mean(jnp.abs(out["textures"] - out0["textures"]))) > 1e-4


def test_textured_render_matches_flat_texture():
    """A constant texture map must render identically to per-vertex colors of
    the same value — the UV path's correctness anchor."""
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    verts = jnp.asarray([[[-0.05, -0.05, 0.3], [0.05, -0.05, 0.3],
                          [0.0, 0.06, 0.31], [0.0, -0.01, 0.35]]], jnp.float32)
    faces = np.asarray([[0, 1, 2], [0, 1, 3], [1, 2, 3], [2, 0, 3]], np.int32)
    uv = jnp.asarray([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9], [0.5, 0.5]])
    S = 16
    K = jnp.asarray([[[S * 2.0, 0, S / 2], [0, S * 2.0, S / 2], [0, 0, 1]]])
    color = jnp.asarray([0.6, 0.4, 0.3])

    settings = RenderSettings(S, 2, backend="jax", face_chunk=4, aa_mode="msaa")
    r_uv = PhongRenderer(faces, settings, vert_uv=uv)
    r_flat = PhongRenderer(faces, settings)
    tex = jnp.broadcast_to(color, (1, 8, 8, 3))
    vcol = jnp.broadcast_to(color, (1, 4, 3))
    img_uv = np.asarray(r_uv(verts, vcol[..., :2] * 0, K, texture_image=tex))
    img_flat = np.asarray(r_flat(verts, vcol, K))
    np.testing.assert_allclose(img_uv, img_flat, atol=1e-5)


def test_textured_render_gradient_to_texture():
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    verts = jnp.asarray([[[-0.05, -0.05, 0.3], [0.05, -0.05, 0.3],
                          [0.0, 0.06, 0.31]]], jnp.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    uv = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.5, 1.0]])
    S = 16
    K = jnp.asarray([[[S * 2.0, 0, S / 2], [0, S * 2.0, S / 2], [0, 0, 1]]])
    r = PhongRenderer(faces, RenderSettings(S, 2, backend="jax", face_chunk=4),
                      vert_uv=uv)

    def f(tex):
        rgba = r(verts, jnp.zeros((1, 3, 2)), K, texture_image=tex)
        return jnp.sum(rgba[..., :3])

    g = jax.grad(f)(jnp.ones((1, 8, 8, 3)) * 0.5)
    assert float(jnp.sum(jnp.abs(g))) > 0


@pytest.mark.slow
def test_nimble_model_end_to_end_uv_render(rng):
    from hifihr_tpu.config import Config
    from hifihr_tpu.models.hifihr import HiFiHR

    S = 32
    cfg = Config(pretrain="res18", hand_model="nimble", render=True,
                 light_estimation=False, image_size=S, aa_factor=2)
    model = HiFiHR(config=cfg)
    f = S * 1.8
    K = jnp.asarray(np.tile(
        np.asarray([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)[None],
        (1, 1, 1)))
    imgs = jnp.asarray(rng.rand(1, S, S, 3).astype(np.float32))
    root = jnp.asarray([[[0.0, 0.0, 0.4]]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs, K, root, train=False)
    out = model.apply(variables, imgs, K, root, train=False)
    assert out["textures"].ndim == 4  # (B, Huv, Wuv, 3) UV map
    assert out["re_img"].shape == (1, S, S, 3)
    assert float(jnp.max(out["re_sil"])) == 255.0

    # photometric losses train through the UV texture: grads reach tex head
    def loss(v):
        o = model.apply(v, imgs, K, root, train=False)
        return jnp.mean(jnp.abs(o["re_img"] - imgs))

    g = jax.grad(loss)(variables)
    tex_g = g["params"]["hand_encoder"]["tex_out"]["kernel"]
    assert float(jnp.sum(jnp.abs(tex_g))) > 0


def test_save_textured_obj(tmp_path):
    from hifihr_tpu.utils.visualize import save_obj

    verts = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [1, 2, 3]], np.int32)
    uv = np.random.RandomState(1).rand(4, 2).astype(np.float32)
    tex = np.random.RandomState(2).rand(16, 16, 3).astype(np.float32)
    path = str(tmp_path / "hand.obj")
    save_obj(path, verts, faces, vert_uv=uv, texture_image=tex)
    obj = open(path).read()
    assert "mtllib hand.mtl" in obj and obj.count("vt ") == 4
    assert "f 1/1 2/2 3/3" in obj
    mtl = open(str(tmp_path / "hand.mtl")).read()
    assert "map_Kd hand.png" in mtl
    png = open(str(tmp_path / "hand.png"), "rb").read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n" and b"IEND" in png


def _quad_scene():
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    verts = jnp.asarray([[[-0.05, -0.05, 0.3], [0.05, -0.05, 0.3],
                          [0.0, 0.06, 0.31], [0.0, -0.01, 0.35]]], jnp.float32)
    # winding chosen so normals face the camera (-z): the default light
    # direction is (0, 0, -1), so diffuse/spec terms actually fire and
    # normal-map perturbations are observable (ambient alone is n-invariant)
    faces = np.asarray([[0, 2, 1], [0, 1, 3], [1, 2, 3], [2, 0, 3]], np.int32)
    S = 16
    K = jnp.asarray([[[S * 2.0, 0, S / 2], [0, S * 2.0, S / 2], [0, 0, 1]]])
    settings = RenderSettings(S, 2, backend="jax", face_chunk=4, aa_mode="msaa")
    return verts, faces, K, settings, PhongRenderer, S


def test_normal_and_spec_maps_change_shading():
    """The 7-channel appearance stack (diffuse+normal+spec) must actually
    modulate shading: perturbing the tangent-space normal map or raising the
    spec weight changes pixels (VERDICT r2 task #7)."""
    verts, faces, K, settings, PhongRenderer, S = _quad_scene()
    uv = jnp.asarray([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9], [0.5, 0.5]])
    r = PhongRenderer(faces, settings, vert_uv=uv)
    diffuse = jnp.broadcast_to(jnp.asarray([0.6, 0.4, 0.3]), (1, 8, 8, 3))
    flat_n = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 1.0]), (1, 8, 8, 3))
    zero_s = jnp.zeros((1, 8, 8, 1))
    one_s = jnp.ones((1, 8, 8, 1))
    base = np.asarray(r(verts, jnp.zeros((1, 4, 2)), K,
                        texture_image=jnp.concatenate([diffuse, flat_n, one_s], -1)))

    # flat normal + unit spec weight must match the plain 3-channel render
    # (spec_map scales the material's own specular term)
    plain = np.asarray(r(verts, jnp.zeros((1, 4, 2)), K, texture_image=diffuse))
    np.testing.assert_allclose(base, plain, atol=2e-3)

    # perturbed normals change shading
    rng = np.random.RandomState(0)
    bump = jnp.asarray(np.clip(
        rng.rand(1, 8, 8, 3) * np.asarray([1.0, 1.0, 0.0]) +
        np.asarray([0.0, 0.0, 1.0]), 0, 1), jnp.float32)
    bumped = np.asarray(r(verts, jnp.zeros((1, 4, 2)), K,
                          texture_image=jnp.concatenate([diffuse, bump, one_s], -1)))
    assert np.abs(bumped - base)[..., :3].max() > 1e-3

    # zeroing the spec weight removes the specular highlight
    matte = np.asarray(r(verts, jnp.zeros((1, 4, 2)), K,
                         texture_image=jnp.concatenate(
                             [diffuse, flat_n, zero_s], -1)))
    assert (base[..., :3] - matte[..., :3]).max() > 1e-4


def test_corner_texture_mode_matches_fragment_sampling():
    """Corner texture mode (renderer._render_corner): PCA appearance sampled
    at face-corner UVs + barycentric interpolation.  On a texture that is
    LINEAR in uv both paths are mathematically identical, so this checks the
    fast path exactly; gradient must reach tex_coef."""
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    verts = jnp.asarray([[[-0.05, -0.05, 0.3], [0.05, -0.05, 0.3],
                          [0.0, 0.06, 0.31], [0.0, -0.01, 0.35]]], jnp.float32)
    faces = np.asarray([[0, 1, 2], [0, 1, 3], [1, 2, 3], [2, 0, 3]], np.int32)
    uv = np.asarray([[0.1, 0.1], [0.9, 0.1], [0.5, 0.9], [0.5, 0.5]], np.float32)
    face_uv = uv[faces]  # (F, 3, 2)
    S = 16
    K = jnp.asarray([[[S * 2.0, 0, S / 2], [0, S * 2.0, S / 2], [0, 0, 1]]])
    settings = RenderSettings(S, 2, backend="jax", face_chunk=4, aa_mode="msaa")

    # mean/basis linear in uv, scaled so mean + 0.3*basis stays in [0, 1]
    # (the corner path clips composed values; keep both paths clip-free)
    h = w = 9
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    u_img, v_img = gx / (w - 1), gy / (h - 1)
    mean = np.stack([0.5 * u_img, 0.5 * v_img, 0.3 * np.ones_like(u_img)], -1)
    basis = np.stack([0.3 * v_img, 0.3 * u_img, 0.3 * u_img], -1)[..., None]
    coef = jnp.asarray([[0.3]])

    def corner_sample(img):  # exact (linear map): evaluate at corner uv
        # img is linear in (u, v): img(u, v) = img(0,0) + u*du + v*dv
        c00, c10, c01 = img[0, 0], img[0, -1], img[-1, 0]
        out = (c00[None, None]
               + face_uv[..., :1] * (c10 - c00)[None, None]
               + face_uv[..., 1:2] * (c01 - c00)[None, None])
        return out.astype(np.float32)

    corner_mean = corner_sample(mean)
    corner_basis = corner_sample(basis[..., 0])[..., None]

    r_frag = PhongRenderer(faces, settings, face_uv=jnp.asarray(face_uv))
    r_corner = PhongRenderer(faces, settings, face_uv=jnp.asarray(face_uv),
                             corner_mean=corner_mean, corner_basis=corner_basis)
    tex_img = jnp.asarray(mean + basis[..., 0] * 0.3)[None]
    vc = jnp.zeros((1, 4, 2))
    img_frag = np.asarray(r_frag(verts, vc, K, texture_image=tex_img))
    img_corner = np.asarray(r_corner(verts, vc, K, tex_coef=coef))
    # bilinear sampling of a linear texture == linear evaluation -> EXACT on
    # interior pixels (bary in [0,1], no clamping anywhere).  Silhouette
    # pixels extrapolate: fragment clamps uv then samples, corner clamps the
    # extrapolated texel — tiny bounded difference, scaled by coverage < 1.
    interior = img_frag[..., 3] == 1.0
    assert interior.any()
    np.testing.assert_allclose(img_corner[interior], img_frag[interior],
                               atol=2e-3)
    np.testing.assert_allclose(img_corner, img_frag, atol=0.05)

    def f(c):
        rgba = r_corner(verts, vc, K, tex_coef=c)
        return jnp.sum(rgba[..., :3])

    g = jax.grad(f)(coef)
    assert float(jnp.abs(g).sum()) > 0


def test_corner_texture_mode_seven_channel():
    """Corner mode with the full 7-channel appearance (diffuse+normal+spec):
    flat normal + unit spec must match the 3-channel corner render closely
    (same anchor as the fragment-path test above)."""
    from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings

    verts = jnp.asarray([[[-0.05, -0.05, 0.3], [0.05, -0.05, 0.3],
                          [0.0, 0.06, 0.31]]], jnp.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    face_uv = np.asarray([[[0.1, 0.1], [0.9, 0.1], [0.5, 0.9]]], np.float32)
    S = 16
    K = jnp.asarray([[[S * 2.0, 0, S / 2], [0, S * 2.0, S / 2], [0, 0, 1]]])
    settings = RenderSettings(S, 2, backend="jax", face_chunk=4, aa_mode="msaa")
    diffuse = np.broadcast_to(np.asarray([0.6, 0.4, 0.3], np.float32), (1, 3, 3))
    flat_n = np.broadcast_to(np.asarray([0.5, 0.5, 1.0], np.float32), (1, 3, 3))
    one_s = np.ones((1, 3, 1), np.float32)
    mean7 = np.concatenate([diffuse, flat_n, one_s], -1)
    basis7 = np.zeros((1, 3, 7, 1), np.float32)
    r7 = PhongRenderer(faces, settings, face_uv=jnp.asarray(face_uv),
                       corner_mean=mean7, corner_basis=basis7)
    r3 = PhongRenderer(faces, settings, face_uv=jnp.asarray(face_uv),
                       corner_mean=diffuse, corner_basis=basis7[:, :, :3])
    vc = jnp.zeros((1, 3, 2))
    coef = jnp.zeros((1, 1))
    img7 = np.asarray(r7(verts, vc, K, tex_coef=coef))
    img3 = np.asarray(r3(verts, vc, K, tex_coef=coef))
    np.testing.assert_allclose(img7, img3, atol=2e-3)


def test_face_uv_seams_no_bleed():
    """Per-corner UVs: two faces sharing an edge but mapped to DISJOINT
    texture tiles must each sample their own tile (impossible with per-vertex
    UVs — the seam would interpolate across the atlas)."""
    _, _, K, settings, PhongRenderer, S = _quad_scene()
    # flat two-triangle quad: BOTH faces visible, sharing the diagonal edge
    verts = jnp.asarray([[[-0.05, -0.05, 0.3], [0.05, -0.05, 0.3],
                          [-0.05, 0.05, 0.3], [0.05, 0.05, 0.3]]], jnp.float32)
    faces = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    # face 0 maps into the left (red) tile, face 1 into the right (green)
    # tile — the shared diagonal is a true atlas seam
    base_uv = np.asarray([[0.1, 0.2], [0.4, 0.2], [0.25, 0.8]], np.float32)
    face_uv = np.stack([base_uv] * 2)
    face_uv[1] = base_uv + np.asarray([0.5, 0.0], np.float32)
    r = PhongRenderer(faces, settings, face_uv=jnp.asarray(face_uv))
    tex = np.zeros((1, 16, 16, 3), np.float32)
    tex[:, :, :8] = [1.0, 0.0, 0.0]   # left half red
    tex[:, :, 8:] = [0.0, 1.0, 0.0]   # right half green
    img = np.asarray(r(verts, jnp.zeros((1, 4, 2)), K,
                       texture_image=jnp.asarray(tex)))
    rgb = img[0, ..., :3]
    cover = img[0, ..., 3] > 0.99
    # covered interior pixels must be (shaded) red or green, never yellow-ish
    # blends of both tiles
    red = rgb[..., 0] > rgb[..., 1] * 2
    green = rgb[..., 1] > rgb[..., 0] * 2
    assert (red | green)[cover].all()
    assert red[cover].any() and green[cover].any()


def test_save_obj_face_uv_roundtrip(tmp_path):
    """OBJ export with a seamed per-corner atlas + 7-channel appearance:
    v/vt counts, f v/vt indexing, and the three map files."""
    import os

    from hifihr_tpu.utils.visualize import save_obj

    verts = np.random.RandomState(0).rand(4, 3).astype(np.float32)
    faces = np.asarray([[0, 1, 2], [0, 1, 3]], np.int32)
    face_uv = np.random.RandomState(1).rand(2, 3, 2).astype(np.float32)
    tex = np.random.RandomState(2).rand(16, 16, 7).astype(np.float32)
    path = save_obj(str(tmp_path / "hand.obj"), verts, faces,
                    face_uv=face_uv, texture_image=tex)
    lines = open(path).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 4
    vts = [l for l in lines if l.startswith("vt ")]
    assert len(vts) == 6  # one per face corner
    fline = [l for l in lines if l.startswith("f ")][1]
    assert fline.split() == ["f", "1/4", "2/5", "4/6"]
    # vt values match (with the v-flip)
    u, v = map(float, vts[0].split()[1:])
    np.testing.assert_allclose([u, 1.0 - v], face_uv[0, 0], atol=1e-5)
    for suffix in (".png", "_normal.png", "_spec.png", ".mtl"):
        assert os.path.exists(str(tmp_path / ("hand" + suffix)))
