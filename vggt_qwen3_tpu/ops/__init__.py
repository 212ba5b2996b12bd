from .norms import rms_norm, layer_norm
from .rope import rope_cos_sin, apply_rope
from .attention import mha
