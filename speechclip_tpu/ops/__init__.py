"""Pure-JAX ops: the fused-kernel layer of the framework (SURVEY.md §2.3)."""

from .attention import (
    attention_backend,
    causal_bias,
    get_attention_backend,
    get_kernel_mesh,
    mha_init,
    multi_head_attention,
    set_attention_backend,
    set_kernel_mesh,
)
from .basic import (
    ACTIVATIONS,
    dropout,
    gelu,
    l2_normalize,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    quick_gelu,
)
from .kw_bn import kw_bn_apply, kw_bn_init
from .losses import (
    contrastive_temp_init,
    contrastive_temperature,
    masked_contrastive_loss,
    masked_contrastive_loss_sharded,
    supcon_loss,
)
from .masking import (
    conv_frame_valid_lengths,
    hubert_feature_lengths,
    key_padding_mask,
    valid_mask,
)
from .mlp import mlp_apply, mlp_init
from .pooling import (
    attentive_pooling_apply,
    attentive_pooling_batch_apply,
    attentive_pooling_init,
    attentive_pooling_mask,
    mean_pooling_apply,
    mean_pooling_init,
)
from .retrieval import mutual_retrieval, recall_at_k
from .schedules import get_schedule, linear_warmup_decay_schedule, noam_schedule
from .transformer import (
    branch_transformer_apply,
    branch_transformer_hidden_states,
    branch_transformer_init,
    mha_and_norm_apply,
    mha_and_norm_init,
    transformer_encoder_apply,
    transformer_encoder_init,
)
from .vq import current_temperature, parse_temp_spec, vq_apply, vq_init
from .weighted_sum import weighted_sum_apply, weighted_sum_init
