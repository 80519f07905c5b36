from dig_tpu.losses.seq_ce import seq_cross_entropy, seq_label_smoothing_cross_entropy
from dig_tpu.losses.infonce import info_nce_loss, label_smooth_softmax_ce, topk_accuracy
from dig_tpu.losses.simclr import seq_simclr_loss
from dig_tpu.losses.extra import dino_loss, msn_loss, sinkhorn
