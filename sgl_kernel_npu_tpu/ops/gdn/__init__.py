from .chunk import (  # noqa: F401
    chunk_gated_delta_rule,
    chunk_gated_delta_rule_varlen,
    chunk_local_cumsum,
    l2norm,
)
from .gating import (  # noqa: F401
    fused_gdn_gating,
    fused_gdn_gating_without_sigmoid,
    fused_qkvzba_split_reshape_cat,
    fused_sigmoid_gating_delta_rule_update,
    layernorm_gated,
)
from .recurrent import recurrent_gated_delta_rule  # noqa: F401
from .recurrent_pallas import (  # noqa: F401
    fused_sigmoid_gating_delta_rule_update_pallas,
)
from .tri_inv import inv_unit_lower, solve_tril, tri_inv_col_sweep  # noqa: F401
