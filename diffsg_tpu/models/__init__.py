from .unet1d import UNet1D, unet_msr, unet_co, unet_nu, swish
