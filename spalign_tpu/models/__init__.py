from spalign_tpu.models.drn import (DRN, drn_c_26, drn_c_42, drn_c_58,
                                    drn_d_22, drn_d_38, drn_d_54, drn_d_105,
                                    IMAGENET_MEAN, IMAGENET_STD,
                                    preprocess_imagenet)
from spalign_tpu.models.segnet import SegNetBasic, SegNet
