from . import batching, checkpoint, data, trace, train
