"""Hand-written Pallas (Mosaic) TPU kernels.

These are the analogue of the reference's NEON kernel layer
(``*_neon.cpp``): the VPU's 8×128 lanes replace the 128-bit NEON
vectors, the Pallas grid replaces the OpenMP row loop, and VMEM tiles
replace the L1-resident working set.  Every kernel here has a pure-jnp
twin in ``vacv_tpu.ops.*`` used as the capability fallback (the role
OpenCV played in the reference's dispatchers).
"""
