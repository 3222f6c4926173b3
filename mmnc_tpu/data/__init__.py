from .task_configs import task_parameters
