# Fast-finetune example: rule-filtered subnets trained for a short schedule
# (parity with reference configs/local_examples/fast_finetune shape:
# model + data + ft schedule + model_space_path + model_sampling_rules).
_base_ = [
    '../../_dynamic_/models/pspnet_ar50to101v2_gsync.py',
    '../../_dynamic_/schedules/schedule_ft2e.py',
    '../../_dynamic_/rules/ar50to101v2_rules.py',
]
