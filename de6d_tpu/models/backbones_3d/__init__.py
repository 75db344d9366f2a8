from . import vfe  # noqa: F401
from . import pointnet2_backbone  # noqa: F401
from . import spconv_backbone  # noqa: F401
from . import pfe  # noqa: F401
from . import spconv_unet  # noqa: F401
from . import iassd_backbone  # noqa: F401
from . import pointmlp_backbone  # noqa: F401
from . import vectorpool  # noqa: F401
