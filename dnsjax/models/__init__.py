from dnsjax.models.decoder import (  # noqa: F401
    DecoderSpec,
    init_decoder_params,
    pos_encode,
    coarse_apply,
    fine_apply,
    out_apply,
    merge_apply,
    decoder_param_count,
)
from dnsjax.models.encoder import init_encoder_params, encode_images  # noqa: F401
from dnsjax.models.features import match_features  # noqa: F401
