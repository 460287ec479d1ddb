"""High-level differentiable mesh renderer (supersampled Phong, like the ref).

Pipeline (mirrors models_res_nimble.py:72-96, 208-220, TPU-first):
  project with pixel intrinsics K (scaled by aa_factor) -> z-buffer face
  selection (Pallas on TPU / lax.scan fallback) -> differentiable barycentric
  interpolation of albedo/normals/points -> Phong shading -> alpha channel
  from coverage -> aa_factor x aa_factor average-pool anti-aliasing.

Deviations from the reference, on purpose:
  * background is black, not PyTorch3D's default white — this makes the
    self-supervised photometric loss consistent (both operands vanish off-hand;
    the reference compares a white-background render to a black-masked image
    in its texture_self branch, losses.py:317-327).
  * silhouette is returned in [0, 1] (the x255 binarisation the reference does
    at models_res_nimble.py:219 is applied by the model wrapper for parity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from hifihr_tpu.render import raster_jax
from hifihr_tpu.render.interpolate import barycentric_coords, interpolate_attribute
from hifihr_tpu.render.mesh import vertex_normals
from hifihr_tpu.render.shading import DirectionalLight, Materials, phong_shade


class RenderSettings(NamedTuple):
    image_size: int = 224
    aa_factor: int = 3  # subsample grid (reference supersamples 224*3)
    backend: str = "auto"  # 'pallas' | 'jax' | 'auto'
    face_chunk: int = 128  # lax.scan chunk for the jax backend
    # 'msaa': in-kernel 3x3 subsample coverage, shade at base res (fast;
    #         alpha identical to the reference's pooled alpha).
    # 'ssaa': reference-exact supersampled shading + average pool.
    aa_mode: str = "msaa"
    # append an interpolated camera-z channel -> (B,H,W,5); completes the
    # legacy (rgb, depth, sil) renderer triple (traineval_util.py:583).
    # Background depth is 0 (the interpolation already computes pix_p, so
    # this is free).
    with_depth: bool = False


def morton_face_order(template_verts, faces) -> np.ndarray:
    """Spatial (Morton/Z-curve) face permutation from template centroids.

    The MSAA rasteriser bins faces in PACKED ROWS of 8 (raster_msaa.py); a
    row's bin bbox is the union of its 8 faces' bboxes, so spatially
    incoherent face order inflates every tile's bin list.  Measured on the
    NIMBLE skin mesh (F=11926): native order gives mean row spans ~35% of
    the hand's extent — nearly every row lands in every tile — while Morton
    order over template centroids gives ~4.5%.  Articulation preserves
    mesh-locality, so the template-space order stays tight for posed hands.
    """
    template_verts = np.asarray(template_verts, np.float64)
    faces = np.asarray(faces)
    cent = template_verts[faces].mean(axis=1)
    q = ((cent - cent.min(0)) / (np.ptp(cent, axis=0) + 1e-9) * 1023).astype(
        np.int64
    )

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def _scale_intrinsics(K: jnp.ndarray, s: float) -> jnp.ndarray:
    scale = jnp.asarray([[s, 1.0, s], [1.0, s, s], [1.0, 1.0, 1.0]], K.dtype)
    return K * scale


def _avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return x.reshape(b, h // k, k, w // k, k, c).mean(axis=(2, 4))


def _pixel_ray_points(zbuf, mask, K, size):
    """Fragment camera positions from the pixel ray and the interpolated
    perspective-correct depth: p = ((u-cx)/fx, (v-cy)/fy, 1) * z at pixel
    centres.  Identical to barycentric interpolation of vertex positions for
    on-face fragments (the fragment lies on its pixel's ray by construction),
    with gradients to verts flowing through z — the lateral components the
    interpolated form carries would move the point OFF the ray, so this is
    both 3 packed-gather channels cheaper and geometrically cleaner.
    zbuf: (B, H, W) with inf on background (masked to 0 here)."""
    B = zbuf.shape[0]
    dt = zbuf.dtype
    u = jnp.arange(size, dtype=dt) + 0.5
    z = jnp.where(mask > 0, zbuf, 0.0)
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    x = (u[None, None, :] - cx) / fx * z
    y = (u[None, :, None] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


class PhongRenderer:
    """Stateless; construct with static faces, call with batched geometry.

    Optional UVs enable textured rendering (the NIMBLE appearance path,
    reference models_res_nimble.py:132-142):
      * `vert_uv` (V, 2): per-vertex chart (continuous, seamless meshes);
      * `face_uv` (F, 3, 2): PER-FACE-CORNER atlas (OBJ `vt` semantics) —
        required for seamed multi-island atlases, interpolated through the
        packed-row static-corner channel (render/interpolate.py).
    `texture_image` in __call__ is (B, Ht, Wt, 3) diffuse, or (B, Ht, Wt, 7)
    diffuse + tangent-space normal map + specular weight — the full NIMBLE
    appearance triple (diffuse/normal/spec PCA UV maps, SURVEY §2.1).
    """

    def __init__(self, faces, settings: RenderSettings = RenderSettings(),
                 vert_uv=None, face_uv=None, sort_template=None,
                 corner_mean=None, corner_basis=None):
        if sort_template is not None:
            # spatial face reorder for raster bin occupancy (morton_face_order
            # docstring); face ids are renderer-internal, so per-face data
            # (face_uv, corner appearance) is permuted alongside and nothing
            # outside changes
            order = morton_face_order(sort_template, faces)
            faces = np.asarray(faces)[order]
            if face_uv is not None:
                face_uv = np.asarray(face_uv)[order]
            if corner_mean is not None:
                corner_mean = np.asarray(corner_mean)[order]
                corner_basis = np.asarray(corner_basis)[order]
        self.faces = jnp.asarray(faces, jnp.int32)
        self.settings = settings
        self.vert_uv = None if vert_uv is None else jnp.asarray(vert_uv, jnp.float32)
        self.face_uv = None if face_uv is None else jnp.asarray(face_uv, jnp.float32)
        # corner-sampled PCA appearance (texture 'corner' mode): mean
        # (F, 3, C) and basis (F, 3, C, T) sampled at the atlas corner UVs
        self.corner_mean = (
            None if corner_mean is None else jnp.asarray(corner_mean, jnp.float32))
        self.corner_basis = (
            None if corner_basis is None else jnp.asarray(corner_basis, jnp.float32))

    def rasterize(self, verts_cam: jnp.ndarray, K: jnp.ndarray):
        """Returns (frag dict, verts_screen) at the supersampled resolution."""
        s = self.settings
        big = s.image_size * s.aa_factor
        K_big = _scale_intrinsics(K, float(s.aa_factor))
        face_id, _ = self._select_faces(verts_cam, K_big, big)
        verts_screen = raster_jax.project_to_screen(verts_cam, K_big)
        frag = barycentric_coords(face_id, verts_screen, self.faces)
        return frag, verts_screen

    def __call__(
        self,
        verts_cam: jnp.ndarray,  # (B, V, 3) camera space, z > 0 forward
        vert_colors: jnp.ndarray,  # (B, V, 3) albedo
        K: jnp.ndarray,  # (B, 3, 3) pixel intrinsics at image_size
        light: DirectionalLight | None = None,
        materials: Materials = Materials(),
        texture_image: jnp.ndarray | None = None,  # (B, Ht, Wt, 3) UV albedo
        tex_coef: jnp.ndarray | None = None,  # (B, T) PCA appearance coeffs
    ) -> jnp.ndarray:
        """Render -> (B, image_size, image_size, 4) RGBA, antialiased.

        Memory note: the supersampled per-pixel gathers are O(B * (3*224)^2 *
        9) floats; storing them for backward OOMs HBM at useful batch sizes,
        so the differentiable part is rematerialised (jax.checkpoint) — the
        z-buffer face-selection pass has no gradient and runs once, outside
        the checkpoint.
        """
        import jax

        s = self.settings
        if light is None:
            light = DirectionalLight.default(verts_cam.shape[0], verts_cam.dtype)
        b, v = verts_cam.shape[:2]

        # corner texture mode (MSAA only): texels = barycentric interpolation
        # of the PCA appearance evaluated at face-corner UVs.  Drops the
        # per-pixel texture gather and its scatter-add backward — measured
        # 325 ms of the 524 ms NIMBLE step at batch 32 (tools/profile_shade)
        # — for one (F,3,C,T)x(B,T) einsum; gradients reach tex_coef through
        # it.  At F≈12k on 224² each face is ~1 px, so this matches
        # per-fragment sampling to sub-texel accuracy (tests/test_uv_texture).
        if (s.aa_mode == "msaa" and tex_coef is not None
                and self.corner_mean is not None):
            return self._render_corner(verts_cam, K, light, materials, tex_coef)
        have_uv = self.face_uv is not None or self.vert_uv is not None
        use_uv = texture_image is not None and have_uv
        tex_c = 0 if texture_image is None else texture_image.shape[-1]
        with_maps = use_uv and tex_c >= 7  # diffuse(3)+normal(3)+spec(1)
        # effective per-corner UV table (for tangents and the static channel)
        face_uv = self.face_uv
        if face_uv is None and self.vert_uv is not None:
            face_uv = self.vert_uv[self.faces]  # (F, 3, 2)
        # per-vertex channel plan: [vert_colors? | uv? | tangent? | normals | points]
        uv_in_verts = use_uv and self.face_uv is None
        nc = 0 if use_uv else vert_colors.shape[-1]

        def assemble(verts_cam, vert_colors, include_points=True):
            parts = []
            if not use_uv:
                parts.append(vert_colors)
            elif uv_in_verts:
                parts.append(jnp.broadcast_to(self.vert_uv[None], (b, v, 2)))
            if with_maps:
                from hifihr_tpu.render.mesh import vertex_normals_and_tangents

                normals, tangents = vertex_normals_and_tangents(
                    verts_cam, self.faces, face_uv)
                parts += [tangents, normals]
            else:
                parts.append(vertex_normals(verts_cam, self.faces))
            if include_points:
                parts.append(verts_cam)
            return jnp.concatenate(parts, axis=-1)

        def shade_pix(pix, pix_uv, texture_image, cover, pix_p=None):
            """pix: interpolated per-vertex channels; pix_uv: (B,H,W,2) or
            None (then UV lives at the head of pix); pix_p: fragment camera
            positions, or None to take them from pix's tail."""
            off = 0
            if not use_uv:
                texels = pix[..., :nc]
                off = nc
                uv = None
            else:
                if pix_uv is None:
                    uv = pix[..., 0:2]
                    off = 2
                else:
                    uv = pix_uv
            tangent = None
            if with_maps:
                tangent = pix[..., off : off + 3]
                off += 3
            pix_n = pix[..., off : off + 3]
            if pix_p is None:
                pix_p = pix[..., off + 3 : off + 6]
            normal_map = spec_map = None
            if use_uv:
                from hifihr_tpu.render.texture import sample_texture

                sampled = sample_texture(texture_image, uv)
                texels = sampled[..., :3]
                if with_maps:
                    normal_map = sampled[..., 3:6]
                    spec_map = sampled[..., 6:7]
            rgb = phong_shade(texels, pix_n, pix_p, light, materials,
                              normal_map=normal_map, tangents=tangent,
                              spec_map=spec_map)
            rgb = rgb * cover[..., None]
            chans = [rgb, cover[..., None]]
            if s.with_depth:
                covered = (cover > 0).astype(rgb.dtype)[..., None]
                chans.append(pix_p[..., 2:3] * covered)
            return jnp.concatenate(chans, axis=-1)

        if s.aa_mode == "msaa":
            K_base = K
            face_id, coverage = self._select_faces_msaa(verts_cam, K_base)

            def shade(verts_cam, vert_colors, light, texture_image):
                from hifihr_tpu.render.interpolate import fragment_interpolate

                verts_screen = raster_jax.project_to_screen(verts_cam, K_base)
                # fragment positions come from the pixel ray + interpolated
                # depth (_pixel_ray_points) instead of interpolating verts —
                # 3 fewer packed-gather channels, identical on-face values
                attrs = assemble(verts_cam, vert_colors, include_points=False)
                static = face_uv if (use_uv and self.face_uv is not None) else None
                pix, mask, zbuf = fragment_interpolate(
                    face_id, verts_screen, self.faces, attrs,
                    corner_attrs_static=static,
                )
                pix_uv = pix[..., -2:] if static is not None else None
                if static is not None:
                    pix = pix[..., :-2]
                pix_p = _pixel_ray_points(zbuf, mask, K_base, s.image_size)
                return shade_pix(pix, pix_uv, texture_image, coverage,
                                 pix_p=pix_p)

            # base-res activations are 9x smaller than SSAA's: storing them
            # for backward is cheaper than rematerialising
            return shade(verts_cam, vert_colors, light, texture_image)

        big = s.image_size * s.aa_factor
        K_big = _scale_intrinsics(K, float(s.aa_factor))
        face_id, _ = self._select_faces(verts_cam, K_big, big)

        def shade(verts_cam, vert_colors, light, texture_image):
            from hifihr_tpu.render.interpolate import interpolate_face_attribute

            verts_screen = raster_jax.project_to_screen(verts_cam, K_big)
            frag = barycentric_coords(face_id, verts_screen, self.faces)
            # one packed gather for all per-vertex attributes
            attrs = assemble(verts_cam, vert_colors)
            pix = interpolate_attribute(frag, attrs)
            pix_uv = None
            if use_uv and self.face_uv is not None:
                pix_uv = interpolate_face_attribute(frag, face_id, face_uv)
            rgba = shade_pix(pix, pix_uv, texture_image, frag["mask"])
            return _avg_pool(rgba, s.aa_factor)

        return jax.checkpoint(shade)(verts_cam, vert_colors, light, texture_image)

    def _render_corner(self, verts_cam, K, light, materials, tex_coef):
        """MSAA render with corner-sampled PCA appearance (see __call__)."""
        from hifihr_tpu.render.interpolate import fragment_interpolate

        s = self.settings
        C = self.corner_mean.shape[-1]
        T = self.corner_basis.shape[-1]
        with_maps = C >= 7  # diffuse(3) + tangent-space normal(3) + spec(1)
        face_id, coverage = self._select_faces_msaa(verts_cam, K)
        corner_tex = self.corner_mean[None] + jnp.einsum(
            "fkct,bt->bfkc", self.corner_basis, tex_coef[:, :T]
        )
        corner_tex = jnp.clip(corner_tex, 0.0, 1.0)

        if with_maps:
            from hifihr_tpu.render.mesh import vertex_normals_and_tangents

            normals, tangents = vertex_normals_and_tangents(
                verts_cam, self.faces, self.face_uv)
            attrs = jnp.concatenate([tangents, normals], axis=-1)
        else:
            attrs = vertex_normals(verts_cam, self.faces)
        verts_screen = raster_jax.project_to_screen(verts_cam, K)
        pix, mask, zbuf = fragment_interpolate(
            face_id, verts_screen, self.faces, attrs,
            corner_attrs_batched=corner_tex,
        )
        off = 0
        tangent = None
        if with_maps:
            tangent = pix[..., :3]
            off = 3
        pix_n = pix[..., off : off + 3]
        pix_p = _pixel_ray_points(zbuf, mask, K, s.image_size)
        sampled = jnp.clip(pix[..., off + 3 : off + 3 + C], 0.0, 1.0)
        texels = sampled[..., :3]
        normal_map = sampled[..., 3:6] if with_maps else None
        spec_map = sampled[..., 6:7] if with_maps else None
        rgb = phong_shade(texels, pix_n, pix_p, light, materials,
                          normal_map=normal_map, tangents=tangent,
                          spec_map=spec_map)
        rgb = rgb * coverage[..., None]
        chans = [rgb, coverage[..., None]]
        if s.with_depth:
            covered = (coverage > 0).astype(rgb.dtype)[..., None]
            chans.append(pix_p[..., 2:3] * covered)
        return jnp.concatenate(chans, axis=-1)

    def _select_faces_msaa(self, verts_cam, K_base):
        """(face_id, coverage) at base resolution via the MSAA kernel, or an
        SSAA-derived emulation on non-TPU backends (test parity)."""
        import jax

        s = self.settings
        verts_screen = raster_jax.project_to_screen(
            jax.lax.stop_gradient(verts_cam), K_base
        )
        backend = s.backend
        if backend == "auto":
            backend = "pallas" if jax.devices()[0].platform == "tpu" else "jax"
        if backend == "pallas":
            from hifihr_tpu.render.raster_msaa import rasterize_msaa_pallas

            face_id, coverage, _ = rasterize_msaa_pallas(
                verts_screen, self.faces, s.image_size, samples=s.aa_factor
            )
            return face_id, coverage
        # emulate: supersampled select, pooled coverage, nearest-face reduce
        big = s.image_size * s.aa_factor
        K_big = _scale_intrinsics(K_base, float(s.aa_factor))
        vs_big = raster_jax.project_to_screen(jax.lax.stop_gradient(verts_cam), K_big)
        fid_big, zbuf_big = raster_jax.rasterize_face_id(
            vs_big, self.faces, big, chunk=s.face_chunk
        )
        a = s.aa_factor
        b_, h, w = fid_big.shape
        fid_blk = fid_big.reshape(b_, h // a, a, w // a, a).transpose(0, 1, 3, 2, 4)
        z_blk = zbuf_big.reshape(b_, h // a, a, w // a, a).transpose(0, 1, 3, 2, 4)
        coverage = jnp.mean((fid_blk >= 0).astype(jnp.float32), axis=(-1, -2))
        z_flat = z_blk.reshape(*z_blk.shape[:3], a * a)
        f_flat = fid_blk.reshape(*fid_blk.shape[:3], a * a)
        nearest = jnp.argmin(z_flat, axis=-1)
        face_id = jnp.take_along_axis(f_flat, nearest[..., None], axis=-1)[..., 0]
        return face_id, coverage

    def _select_faces(self, verts_cam, K_big, big):
        import jax

        verts_screen = raster_jax.project_to_screen(
            jax.lax.stop_gradient(verts_cam), K_big
        )
        backend = self.settings.backend
        if backend == "auto":
            platform = jax.devices()[0].platform
            backend = "pallas" if platform == "tpu" else "jax"
        if backend == "pallas":
            from hifihr_tpu.render.raster_pallas import rasterize_face_id_pallas

            return rasterize_face_id_pallas(verts_screen, self.faces, big)
        return raster_jax.rasterize_face_id(
            verts_screen, self.faces, big, chunk=self.settings.face_chunk
        )
