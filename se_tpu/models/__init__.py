from .dccrn import DCCRN
from .crn import CRN
from .fullsubnet import FullSubNet
from .factory import build_model
