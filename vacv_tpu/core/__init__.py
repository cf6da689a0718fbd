from .image import Image, as_array, as_image
from .types import (BorderMode, ColorCode, ExtreSize, IndexValue, InterMode,
                    Layout, MatchMode, NormalAlg, SimpleSize, VAngle,
                    VEyeInfo, VMatrix, VPoint, VPoint3, VRect, VScalar, VSize)
