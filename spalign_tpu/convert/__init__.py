from spalign_tpu.convert.pth_to_jax import (convert_drn_state_dict,
                                            load_drn_checkpoint,
                                            save_pytree, load_pytree)
