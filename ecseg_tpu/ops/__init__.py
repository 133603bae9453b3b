from . import tiling, morphology, cc, threshold, resize
