// Truffle configuration (parity surface for the contracts/ suite).
// The repo's own CI validates the hash contracts with the in-process
// mini-EVM (tests/test_evm.py); this config is for users deploying with
// a standard truffle/ganache toolchain.
module.exports = {
  networks: {
    development: {
      host: 'localhost',
      port: 8545,
      network_id: '*',
      gas: 6700000
    }
  },
  compilers: {
    solc: {
      version: '0.5.16',
      settings: {
        optimizer: {
          enabled: true,
          runs: 200
        }
      }
    }
  },
  mocha: {
    reporter: 'eth-gas-reporter'
  }
};
