from voxtral_tpu.models.encoder import (
    conv_stem, encoder_forward, encoder_incremental, EncoderState,
    init_encoder_state,
)
from voxtral_tpu.models.adapter import adapter_forward
from voxtral_tpu.models.decoder import (
    DecodeState, init_decode_state, decoder_prefill, decode_scan,
    time_conditioning, ada_scales,
)
from voxtral_tpu.models.pipeline import transcribe_tokens_batch

__all__ = [
    "conv_stem", "encoder_forward", "encoder_incremental", "EncoderState",
    "init_encoder_state", "adapter_forward", "DecodeState",
    "init_decode_state", "decoder_prefill", "decode_scan",
    "time_conditioning", "ada_scales", "transcribe_tokens_batch",
]
