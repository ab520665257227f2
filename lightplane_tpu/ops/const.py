"""Global constants.

TPU analogue of the reference's ``triton_src/shared/const.py:9-15``. The GPU
flags (``ALLOW_TF32``, ``ALLOW_WARP_DIVERGENCE``) have no TPU meaning and are
dropped; ``MIN_BLOCK_SIZE`` is kept for API parity — the renderer pads the
color-MLP output channels up to this size (reference ``mlp_utils.py:414-424``).
"""

# Minimum number of rendered channels; the color MLP's last layer is
# zero-padded up to this width (matches reference MIN_BLOCK_SIZE=16).
MIN_BLOCK_SIZE: int = 16

# Ray-block size used when padding ray batches for the fused TPU paths.
# The reference pads to 16 (one Triton program per 16 rays); on TPU we tile
# rays in (8, 128)-register-friendly blocks of 128.
TPU_RAY_BLOCK: int = 128
