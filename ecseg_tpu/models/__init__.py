from . import layers, metaseg_unet, nuset, classifiers, quant
