from dig_tpu.data.masking import RandomMaskingGenerator, random_mask_batch
