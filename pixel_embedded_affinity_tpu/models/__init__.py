from .resunet2d import ResidualUNet2D, ResidualUNet2DDeep
from .unet3d_pni import UNetPNIEmbeddingDeep
from .unet3d_mala import UNet3DMALADeep
from .resnet_embed import ResNetEmbedding
