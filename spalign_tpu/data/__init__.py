from spalign_tpu.data.labels import create_label_mask, remap_label_ids
from spalign_tpu.data.synthetic import SyntheticRoadScenes
