from .context import Ctx
from .glass_rcnn import (
    GlassArch,
    emit_mask,
    emit_text,
    init_glass_params,
    glass_inference_single,
    make_inference_fn,
)
