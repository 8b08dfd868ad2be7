from rawaudiovae_kelsey_tpu.ops.pallas_mlp import (  # noqa: F401
    dec_bwd_fused,
    decoder_bwd,
    decoder_fwd,
    enc_bwd_dw1,
    encoder_bwd,
    encoder_fwd,
    grad_accum,
    grad_accum2,
    matmul_nt,
    matmul_nt2_mask,
    matmul_nt_mask,
    pallas_decode,
    pallas_encode,
)
from rawaudiovae_kelsey_tpu.ops.rng import (  # noqa: F401
    pallas_reparameterize,
    sharded_pallas_reparameterize,
)
from rawaudiovae_kelsey_tpu.ops.quant import (  # noqa: F401
    quantize_decoder,
    quantize_weight,
    quantized_decode_xla,
    quantized_decoder_fwd,
)
from rawaudiovae_kelsey_tpu.ops.pallas_linear import (  # noqa: F401
    deep_decode_pallas,
    deep_encode_pallas,
    linear_fwd,
    linear_ksplit_fwd,
    pallas_linear,
)
from rawaudiovae_kelsey_tpu.ops.pallas_conv import (  # noqa: F401
    conv1d_pallas,
    conv1d_transpose_pallas,
    conv_decode_pallas,
    conv_encode_pallas,
)
from rawaudiovae_kelsey_tpu.ops.pallas_toeplitz import (  # noqa: F401
    toeplitz_matmul,
)
from rawaudiovae_kelsey_tpu.ops.pallas_loss import (  # noqa: F401
    pallas_loss,
    pallas_loss_components,
)
