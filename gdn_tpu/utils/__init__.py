from gdn_tpu.utils.logging import MetricLogger
