from .substitute import (
    substitute_transform,
    named_dmx_modules,
    DMX_AWARE_MAPPING,
    RAW_OP_MAPPING,
    default_mapping,
)
from .intercept import intercept, InterceptRules, SiteRule, QuantizedFunction
from .legacy import cast_input_output_transform, configure_graph, node_dict
