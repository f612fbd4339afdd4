from .att_unet_convlstm import AttUNetConvLSTM  # noqa: F401
from .cnn_transformer import CNNTransformer  # noqa: F401
from .convlstm import ConvLSTM, ConvLSTMCell  # noqa: F401
from .registry import get_model, is_sequence_model, n_input_channels  # noqa: F401
from .simple_cnn import SimpleCNN  # noqa: F401
from .unet import UNet  # noqa: F401
