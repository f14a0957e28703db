from spalign_tpu.utils.timers import StageTimer
