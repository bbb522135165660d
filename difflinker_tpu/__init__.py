"""difflinker_tpu — TPU-native molecular linker diffusion framework."""

__version__ = "0.1.0"
