from .model import (
    DmxModel,
    DmxConfig,
    DmxConfigRule,
    DmxTransformation,
    DmxPipelineMixin,
    DmxSimplePipeline,
    Model,
)
