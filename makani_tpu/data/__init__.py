from makani_tpu.data.dataloader import get_dataloader, init_distributed_io
