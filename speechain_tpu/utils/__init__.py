from speechain_tpu.utils.yamlref import load_yaml
from speechain_tpu.utils.registry import register, resolve
