"""hifihr_tpu — TPU-native high-fidelity single-image 3D hand reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the HiFiHR
reference (single-image hand reconstruction: CNN encoder -> parametric hand
layer (MANO/NIMBLE) -> differentiable rasterizer -> ~20-loss supervision stack
over FreiHAND / RHD / HO-3D / DART at full / weak / self supervision levels).

Design stance (TPU-first):
  * pure-functional core: every model is `apply(params, batch) -> outputs`,
    jit-compiled with static shapes (224x224 images, 778/5990 verts, 21/25
    joints) so XLA tiles everything onto the MXU.
  * data parallelism via `jax.sharding.Mesh` + NamedSharding; gradients
    all-reduce over ICI inside one compiled SPMD program (see
    hifihr_tpu.parallel.mesh).
  * the differentiable rasterizer is a Pallas TPU kernel
    (hifihr_tpu.render), replacing the reference's PyTorch3D CUDA extension.
  * assets (MANO pickle with chumpy objects) are converted offline to plain
    npz; no chumpy/pickle at training time.
"""

__version__ = "0.1.0"
