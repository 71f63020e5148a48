from msmd_tpu.ops.seq import (  # noqa: F401
    sinusoidal_table,
    apply_pe_single_row,
    enc_dec_mask,
    pad_audio,
    linear_interpolate,
)
from msmd_tpu.ops.schedule import DiffusionSchedule  # noqa: F401
