from .bound import lower_bound, upper_bound
from .layers import conv, deconv, Conv, Deconv, GDN
from .quant import quantize_noise, quantize_ste, quantize_round
