from .decode import (  # noqa: F401
    decode_gqa,
    decode_gqa_pallas,
    decode_gqa_ref,
    decode_mla,
    decode_mla_pallas,
    decode_mla_ref,
)
from .paged_prefill import (  # noqa: F401
    block_mask_to_page_lists,
    block_sparse_paged_attention,
    paged_prefill_attention,
)
