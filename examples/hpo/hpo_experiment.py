"""HPO example — parity with examples/hpo/hpo_experiment.py: run
hyperparameter optimization for an RL algorithm on a task."""

from safe_control_gym_tpu.hyperparameters.hpo import HPO
from safe_control_gym_tpu.utils.configuration import ConfigFactory


def run(sampler='tpe'):
    CONFIG_FACTORY = ConfigFactory()
    CONFIG_FACTORY.add_argument('--sampler', type=str, default=sampler)
    config = CONFIG_FACTORY.merge()

    hpo = HPO(config.algo, config.task,
              sampler=getattr(config, 'sampler', sampler),
              output_dir=config.output_dir,
              task_config=config.task_config,
              algo_config=config.algo_config,
              hpo_config=config.get('hpo_config', {}))
    study = hpo.hyperparameter_optimization()
    print('Best value:', study.best_value)
    print('Best params:', study.best_params)
    return study


if __name__ == '__main__':
    run()
