from spalign_tpu.eval.results import ResultWriter, aggregate_results
