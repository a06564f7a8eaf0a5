from thinkdiff_tpu.ops.flash_attention import flash_attention, mha_reference
from thinkdiff_tpu.ops.decode_attention import decode_attention, update_kv_cache
from thinkdiff_tpu.ops.norms import rmsnorm, t5_layernorm, layernorm, rmsnorm_reference
from thinkdiff_tpu.ops.rope import (
    apply_rope, apply_mrope, rope_frequencies, rope_from_positions, mrope_cos_sin,
)
