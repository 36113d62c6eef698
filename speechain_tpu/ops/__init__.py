from speechain_tpu.ops.frontend import LogMelFrontend, FrontendConfig
