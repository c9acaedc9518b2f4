from flash_attn_tpu.models.gpt import (  # noqa: F401
    GPTLMHeadModel,
    GPTModel,
    remap_state_dict_hf_gpt2,
    shard_params_tp,
    combine_params_tp,
)
from flash_attn_tpu.models.llama import (  # noqa: F401
    llama_config_to_gpt2_config,
    remap_state_dict_hf_llama,
    remap_state_dict_meta_llama,
)
from flash_attn_tpu.models.opt import (  # noqa: F401
    opt_config_to_gpt2_config,
    remap_state_dict_hf_opt,
)
from flash_attn_tpu.models.gptj import (  # noqa: F401
    gptj_config_to_gpt2_config,
    remap_state_dict_hf_gptj,
)
from flash_attn_tpu.models.gpt_neox import (  # noqa: F401
    gpt_neox_config_to_gpt2_config,
    remap_state_dict_hf_gpt_neox,
)
from flash_attn_tpu.models.falcon import (  # noqa: F401
    falcon_config_to_gpt2_config,
    remap_state_dict_hf_falcon,
)
from flash_attn_tpu.models.bigcode import (  # noqa: F401
    bigcode_config_to_gpt2_config,
    remap_state_dict_hf_bigcode,
)
from flash_attn_tpu.models.baichuan import (  # noqa: F401
    baichuan_config_to_gpt2_config,
    remap_state_dict_hf_baichuan,
)
from flash_attn_tpu.models.btlm import (  # noqa: F401
    btlm_config_to_gpt2_config,
    remap_state_dict_hf_btlm,
)
from flash_attn_tpu.models.bert import (  # noqa: F401
    BertForPreTraining,
    BertModel,
    remap_state_dict_hf_bert,
)
from flash_attn_tpu.models.vit import (  # noqa: F401
    VisionTransformer,
    vit_base_patch16_224,
    vit_large_patch16_224,
    vit_small_patch16_224,
)
