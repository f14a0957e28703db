from spalign_tpu.ops.prior import pixel_prior, superpixel_prior
from spalign_tpu.ops.metrics import (confusion_matrix, iou_from_confusion,
                                     precision_recall_from_confusion,
                                     segmentation_scores)
from spalign_tpu.ops.segments import (segment_mean, segment_sizes,
                                      center_of_mass, sample_segment_anchors)
from spalign_tpu.ops.align import superpixel_align, bilinear_sample
from spalign_tpu.ops.kmeans import (weighted_kmeans,
                                    weighted_kmeans_dynamic,
                                    weighted_kmeans_from_init,
                                    kmeans_seed_assignment, paint_clusters)
from spalign_tpu.ops.lrn import local_response_normalization
from spalign_tpu.ops.pooling import max_pool_argmax_2x2, max_unpool_2x2
