from spalign_tpu.kernels.slic import slic, rgb_to_lab
