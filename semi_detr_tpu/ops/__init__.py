from . import gmm, hungarian, nms, roi_align
from .ms_deform_attn import ms_deform_attn

__all__ = ["gmm", "hungarian", "nms", "roi_align", "ms_deform_attn"]
