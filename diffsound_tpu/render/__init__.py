"""TPU-native differentiable render layer.

Replaces the reference's vendored nvdiffrec stack
(/root/reference/src/dmtet/render/: render/mesh/obj/material/texture/
mlptexture/light/util/regularizer plus the renderutils CUDA plugin and the
nvdiffrast rasterizer) with a pure-JAX design:

  * BSDFs are plain differentiable functions (autodiff replaces the
    hand-written backward kernels in renderutils/c_src/);
  * rasterization is a static-shape chunked z-buffer scan with an
    analytic-barycentric differentiable resolve and a soft-silhouette
    coverage term standing in for dr.antialias silhouette gradients;
  * environment-light pre-integration is expressed as constant linear
    operators (precomputed direction-dependent weights) applied to the
    trainable cubemap, so gradients to the light are exact and the work
    maps onto dense matmuls.
"""

# submodules import on demand (diffsound_tpu.render.<name>); no eager
# imports here to keep `import diffsound_tpu` light and cycle-free
