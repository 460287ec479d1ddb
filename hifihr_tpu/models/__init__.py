from hifihr_tpu.models.hifihr import HiFiHR, build_model
