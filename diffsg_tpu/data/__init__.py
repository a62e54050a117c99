from .loaders import TaskData, load_msr, load_co, load_nu
from .preprocess import data_preprocess_co, CO_COMMON_FEATURES
from .normalize import min_max_norm, mean_norm, read_dataset_legacy
from . import generators
from .synthetic import validation_data_gen
