from dig_tpu.train.state import TrainState
