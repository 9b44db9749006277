from onet_tpu.report.logs import epoch_log_line, setup_logging, mine_epoch_metrics
