from .optim import make_optimizer
from .loss_sampler import LossSampler
from .loop import (
    TrainState, make_train_step, build_step_fn, init_train_state, train,
    rand_uv, rand_uv_mask, default_extra_loss, device_dataset,
    make_device_data_step,
)
from .checkpoint import (
    save_pytree, load_pytree, save_scene, load_scene,
    save_train_state, load_train_state,
)
from .eval import evaluate
from .calibrate import calibrate_exposure
