from hifihr_tpu.render.renderer import PhongRenderer, RenderSettings
from hifihr_tpu.render.mesh import vertex_normals
from hifihr_tpu.render.raster_jax import rasterize_face_id
