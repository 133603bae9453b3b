from . import batching, checkpoint, data, hostmem, trace, train
