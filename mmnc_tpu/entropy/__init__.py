from .entropy_bottleneck import EntropyBottleneck
from .gaussian_conditional import GaussianConditional, get_scale_table
from .tables import CdfTable, build_eb_table, build_gc_table, pmf_to_quantized_cdf_np
