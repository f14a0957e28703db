from spalign_tpu.selftrain.relabel import relabel_dataset, NpzShardWriter
from spalign_tpu.selftrain.rounds import RoundsDriver
