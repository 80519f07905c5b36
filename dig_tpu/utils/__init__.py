from dig_tpu.utils.charset import Charset, build_charset
from dig_tpu.utils.schedules import cosine_schedule, moco_momentum_schedule
