from .drunet import DRUNet  # noqa: F401
from .unet import UNet  # noqa: F401
from .deeplabv2 import DeepLabV2  # noqa: F401
from .resnet_unet import ResNetUNet  # noqa: F401
from .discriminators import (  # noqa: F401
    UncertaintyDiscriminator, OutputDiscriminator, MLPDiscriminator,
    BoundaryDiscriminator, PatchGAN,
)
from .common import SegOutput, build_segmentor  # noqa: F401
