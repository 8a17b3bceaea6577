from .decode import (  # noqa: F401
    decode_gqa,
    decode_gqa_pallas,
    decode_gqa_ref,
    decode_mla,
    decode_mla_pallas,
    decode_mla_ref,
)
