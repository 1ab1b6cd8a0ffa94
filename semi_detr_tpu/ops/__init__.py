from .ms_deform_attn import ms_deform_attn  # noqa: F401
