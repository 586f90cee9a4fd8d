from ccnet_tpu.nn.layers import ABN, Conv, torch_conv_init

__all__ = ["ABN", "Conv", "torch_conv_init"]
