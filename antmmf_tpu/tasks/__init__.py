from antmmf_tpu.tasks.base_task import BaseTask  # noqa: F401
