from .trainer import trainer_synapse, make_train_step, poly_lr_schedule

__all__ = ["trainer_synapse", "make_train_step", "poly_lr_schedule"]
