from .image import Image, as_array, as_image
from .types import (BorderMode, ColorCode, InterMode, Layout, MatchMode,
                    NormalAlg, VPoint, VRect, VScalar, VSize)
