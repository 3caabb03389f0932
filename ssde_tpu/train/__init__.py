from .state import TrainState, create_optimizer, make_lr_schedule
from .steps import (
    MonoModels,
    build_mono_models,
    init_mono_params,
    mono_loss_fn,
    make_mono_train_step,
    predict_poses,
    generate_images_pred,
    compute_losses,
)
