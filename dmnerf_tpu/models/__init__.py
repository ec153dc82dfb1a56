from dmnerf_tpu.models.fields import (
    FieldConfig, init_field_params, apply_field, field_output_dim, param_count,
)

__all__ = [
    "FieldConfig", "init_field_params", "apply_field", "field_output_dim", "param_count",
]
