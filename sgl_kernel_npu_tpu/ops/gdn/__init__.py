from .chunk import chunk_gated_delta_rule, chunk_gated_delta_rule_varlen, l2norm  # noqa: F401
from .recurrent import recurrent_gated_delta_rule  # noqa: F401
from .tri_inv import inv_unit_lower, solve_tril, tri_inv_col_sweep  # noqa: F401
