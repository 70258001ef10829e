from .mlp import ModelDef, define_model_arch, init_model, apply_model, \
    count_params
