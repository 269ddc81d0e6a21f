from .attention import (
    dot_product_attention,
    get_attention_impl,
    repeat_kv,
    set_attention_impl,
)
from .moe import moe_mlp, router_topk
from .norms import layer_norm, rms_norm, set_rmsnorm_impl
from .rope import apply_rope, rope_cos_sin, rotate_half
