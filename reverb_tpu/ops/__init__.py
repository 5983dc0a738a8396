"""reverb_tpu.ops — Pallas TPU kernels for the hot ops.

Kernels are written TPU-first (VMEM-resident blocks feeding the MXU) with an
XLA fallback everywhere so the whole framework still runs on CPU; on CPU the
kernels themselves are exercised through Pallas interpret mode in tests.

Toggle: :func:`set_use_pallas` / env ``REVERB_TPU_NO_PALLAS=1``.
"""

from reverb_tpu.ops.flash_attention import (  # noqa: F401
    rel_pos_flash_attention,
    flash_attention_eligible,
    set_use_pallas,
    use_pallas_enabled,
)
