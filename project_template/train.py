import ever_tpu as er


def train(trainer_name='th_ddp'):
    trainer = er.trainer.get_trainer(trainer_name)()
    trainer.run()


if __name__ == '__main__':
    train()
