from tpul2.models.mlp import (  # noqa: F401
    FFNParams,
    init_ffn,
    ffn_forward,
    loss_fn,
    train_step,
    make_sharded_train_step,
)
