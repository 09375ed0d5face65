from .mpcl_kernel import mpcl_loss_fused  # noqa: F401
from .pseudo_label_kernel import pseudo_label_fused  # noqa: F401
from .centroid_kernel import soft_centroids_fused  # noqa: F401
from .mpcl_pseudo_kernel import mpcl_pseudo_fused  # noqa: F401
