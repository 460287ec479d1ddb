"""Phong shading with directional lights (camera-space, R=I, t=0).

Semantics follow the reference's PyTorch3D HardPhongShader setup
(models_res_nimble.py:72-96): Materials(diffuse=0.8, specular=0.2,
shininess=30, ambient=1.0) and DirectionalLights(ambient=0.5,
specular=0.2, diffuse/direction regressed by the LightEstimator).

pixel = texel * (light_ambient*mat_ambient + light_diffuse*mat_diffuse*(N.L))
        + light_specular*mat_specular*(V.R)^shininess
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Materials(NamedTuple):
    ambient: tuple = (1.0, 1.0, 1.0)
    diffuse: tuple = (0.8, 0.8, 0.8)
    specular: tuple = (0.2, 0.2, 0.2)
    shininess: float = 30.0


class DirectionalLight(NamedTuple):
    ambient_color: jnp.ndarray  # (B, 3)
    diffuse_color: jnp.ndarray  # (B, 3)
    specular_color: jnp.ndarray  # (B, 3)
    direction: jnp.ndarray  # (B, 3) surface -> light

    @staticmethod
    def from_estimator(colors: jnp.ndarray, directions: jnp.ndarray) -> "DirectionalLight":
        b = colors.shape[0]
        half = jnp.full((b, 3), 0.5, colors.dtype)
        fifth = jnp.full((b, 3), 0.2, colors.dtype)
        return DirectionalLight(half, colors, fifth, directions)

    @staticmethod
    def default(batch: int, dtype=jnp.float32) -> "DirectionalLight":
        return DirectionalLight(
            jnp.full((batch, 3), 0.5, dtype),
            jnp.full((batch, 3), 0.3, dtype),
            jnp.full((batch, 3), 0.2, dtype),
            jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], dtype), (batch, 1)),
        )


def phong_shade(
    texels: jnp.ndarray,  # (B, H, W, 3) interpolated albedo
    normals: jnp.ndarray,  # (B, H, W, 3) interpolated normals (unnormalised ok)
    points: jnp.ndarray,  # (B, H, W, 3) camera-space surface points
    light: DirectionalLight,
    materials: Materials = Materials(),
    normal_map: jnp.ndarray | None = None,  # (B, H, W, 3) tangent-space, [0,1]
    tangents: jnp.ndarray | None = None,  # (B, H, W, 3) interpolated tangents
    spec_map: jnp.ndarray | None = None,  # (B, H, W, 1) per-pixel spec weight
) -> jnp.ndarray:
    """Phong shading; optional per-pixel appearance maps (NIMBLE's PCA
    appearance is diffuse + normal + specular UV maps, SURVEY §2.1):
    `normal_map` perturbs the geometric normal in the interpolated (T, B, N)
    tangent frame, `spec_map` scales the specular term per pixel."""
    # eps inside the sqrt keeps gradients finite where the vector is exactly
    # zero (uncovered pixels interpolate to zero normals/points)
    def safe_normalize(x, eps=1e-12):
        return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)

    n = safe_normalize(normals)
    if normal_map is not None and tangents is not None:
        # Gram-Schmidt the interpolated tangent against n, build the
        # bitangent, decode the map from [0,1] -> [-1,1]
        t = tangents - jnp.sum(tangents * n, axis=-1, keepdims=True) * n
        t = safe_normalize(t)
        bt = jnp.cross(n, t)
        nm = normal_map * 2.0 - 1.0
        n = safe_normalize(
            t * nm[..., 0:1] + bt * nm[..., 1:2] + n * nm[..., 2:3]
        )
    l = safe_normalize(light.direction)[:, None, None, :]
    ndl = jnp.maximum(jnp.sum(n * l, axis=-1, keepdims=True), 0.0)

    amb = jnp.asarray(materials.ambient, texels.dtype) * light.ambient_color[:, None, None, :]
    dif = (
        jnp.asarray(materials.diffuse, texels.dtype)
        * light.diffuse_color[:, None, None, :]
        * ndl
    )

    # specular: view dir toward camera at origin; reflect light about normal
    view = -safe_normalize(points)
    reflect = -l + 2.0 * jnp.sum(n * l, axis=-1, keepdims=True) * n
    cos_alpha = jnp.maximum(jnp.sum(view * reflect, axis=-1, keepdims=True), 0.0)
    # gate on front-facing light like PyTorch3D
    cos_alpha = jnp.where(ndl > 0, cos_alpha, 0.0)
    spec = (
        jnp.asarray(materials.specular, texels.dtype)
        * light.specular_color[:, None, None, :]
        * jnp.power(cos_alpha, materials.shininess)
    )
    if spec_map is not None:
        spec = spec * spec_map
    return texels * (amb + dif) + spec
